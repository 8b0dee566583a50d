"""pred_reverse / charset files / box_score_slow coverage."""

import numpy as np

from paddleocr_spark.kernels.ctc import (
    DIGIT_CHARS,
    build_charset,
    ctc_decode,
    load_charset_file,
    pred_reverse,
)
from paddleocr_spark.kernels.db import (
    DBParams,
    component_score_slow,
    db_postprocess,
)
from paddleocr_spark.kernels.geometry import connected_components


def test_pred_reverse_segments():
    # LTR runs keep internal order; run sequence reverses (rec.py:54-67)
    assert pred_reverse("abc") == "abc"
    assert pred_reverse("abاcd") == "cdاab"
    assert pred_reverse("اب") == "با"
    assert pred_reverse("12 kgم") == "م12 kg"


def test_ctc_decode_reverse_flag():
    charset = build_charset(["a", "b", "ا"])
    logits = np.zeros((4, 4), dtype=np.float32)
    for t, ch in enumerate([1, 3, 0, 2]):  # a, ﺍ, blank, b
        logits[t, ch] = 0.9
    assert ctc_decode(logits, charset)[0] == "aاb"
    assert ctc_decode(logits, charset, reverse=True)[0] == "bاa"


def test_load_charset_file(tmp_path):
    p = tmp_path / "digits_dict.txt"
    p.write_text("\n".join(DIGIT_CHARS) + "\n", encoding="utf-8")
    chars, reverse = load_charset_file(str(p))
    assert chars == DIGIT_CHARS + [" "]
    assert reverse is False
    p2 = tmp_path / "arabic_dict.txt"
    p2.write_text("x\n", encoding="utf-8")
    _, rev2 = load_charset_file(str(p2), use_space_char=False)
    assert rev2 is True


def _l_shape_map():
    """L-shaped component of prob 1.0 on a 0.05 background."""
    pm = np.full((40, 60), 0.05, dtype=np.float32)
    pm[10:30, 10:18] = 1.0   # vertical bar
    pm[22:30, 10:40] = 1.0   # horizontal bar
    return pm


def test_component_score_slow_exact_on_l_shape():
    pm = _l_shape_map()
    comps = connected_components(pm > 0.3)
    assert len(comps) == 1
    assert component_score_slow(pm, comps[0]) == 1.0


def test_score_mode_slow_vs_fast_on_l_shape():
    """fast scores the min-rect mask (includes background of the L's
    notch) < slow's exact region mean — and with box_thresh between
    the two, only slow keeps the box."""
    pm = _l_shape_map()
    shape = [40.0, 60.0, 1.0, 1.0]
    fast = db_postprocess(pm, shape, DBParams(box_thresh=0.9))
    slow = db_postprocess(pm, shape,
                          DBParams(box_thresh=0.9, score_mode="slow"))
    assert len(fast) == 0 and len(slow) == 1


def test_score_modes_agree_on_solid_rect():
    pm = np.full((32, 32), 0.05, dtype=np.float32)
    pm[8:24, 6:26] = 0.95
    shape = [32.0, 32.0, 1.0, 1.0]
    fast = db_postprocess(pm, shape, DBParams())
    slow = db_postprocess(pm, shape, DBParams(score_mode="slow"))
    assert np.array_equal(fast, slow)


def test_psnr_known_value():
    import math

    from paddleocr_spark.kernels.sr import psnr

    a = np.zeros((8, 8))
    b = np.full((8, 8), 10.0 / 255.0)  # uniform offset of 10/255
    # mse = 100 -> psnr = 20*log10(255/10)
    assert abs(psnr(a, b) - 20 * math.log10(25.5)) < 1e-9
    assert psnr(a, a) == float("inf")


def test_ssim_identity_and_bounds():
    from paddleocr_spark.kernels.sr import gaussian_window, ssim

    rng = np.random.default_rng(3)
    img = rng.random((32, 48))
    assert abs(ssim(img, img) - 1.0) < 1e-9
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    s = ssim(img, noisy)
    assert 0.0 < s < 0.95
    w = gaussian_window()
    assert abs(w.sum() - 1.0) < 1e-12 and len(w) == 11
