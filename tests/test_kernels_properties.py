"""Property-based kernel tests (hypothesis): invariants that must hold
for ANY input, complementing the golden-value tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from paddleocr_spark.kernels.ctc import build_charset, ctc_decode
from paddleocr_spark.kernels.db import db_postprocess
from paddleocr_spark.kernels.reading_order import reading_order_indices

CHARSET = build_charset()


@given(st.integers(2, 30), st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_ctc_decode_no_blanks_no_repeats(t, seed):
    """Decoded text never contains the blank symbol and adjacent
    repeated *indices* always collapse."""
    rng = np.random.default_rng(seed)
    logits = rng.random((t, len(CHARSET))).astype(np.float32)
    text, conf = ctc_decode(logits, CHARSET)
    idx = logits.argmax(axis=1)
    # collapsed length == number of run-starts that aren't blank
    runs = [i for k, i in enumerate(idx) if (k == 0 or idx[k - 1] != i) and i != 0]
    assert len(text) == len(runs)
    assert 0.0 <= conf <= 1.0


@given(st.integers(0, 2**32 - 1), st.integers(0, 12))
@settings(max_examples=30, deadline=None)
def test_reading_order_is_permutation(seed, n):
    rng = np.random.default_rng(seed)
    boxes = rng.random((n, 4, 2)).astype(np.float32) * 200
    order = reading_order_indices(boxes)
    assert sorted(order) == list(range(n))


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_db_postprocess_outputs_in_bounds(seed):
    rng = np.random.default_rng(seed)
    pm = rng.random((32, 64)).astype(np.float32)
    src_h, src_w = 64, 128
    boxes = db_postprocess(pm, [src_h, src_w, 0.5, 0.5])
    assert boxes.ndim == 3 and boxes.shape[1:] == (4, 2)
    if len(boxes):
        assert boxes[:, :, 0].min() >= 0 and boxes[:, :, 0].max() <= src_w - 1
        assert boxes[:, :, 1].min() >= 0 and boxes[:, :, 1].max() <= src_h - 1


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_reading_order_deterministic(seed):
    rng = np.random.default_rng(seed)
    boxes = rng.random((8, 4, 2)).astype(np.float32) * 100
    assert reading_order_indices(boxes) == reading_order_indices(boxes)


@given(st.text(min_size=0, max_size=40))
@settings(max_examples=60, deadline=None)
def test_pred_reverse_is_involution_and_permutation(s):
    """Applying the RTL segment reversal twice restores the input, and
    it only permutes characters (multiset preserved)."""
    from paddleocr_spark.kernels.ctc import pred_reverse

    r = pred_reverse(s)
    assert sorted(r) == sorted(s)
    assert pred_reverse(r) == s


@given(st.integers(0, 2**32 - 1), st.integers(1, 30))
@settings(max_examples=30, deadline=None)
def test_hard_nms_kept_boxes_never_overlap(seed, n):
    """After greedy NMS no two kept boxes exceed the IoU threshold."""
    from paddleocr_spark.kernels.nms import hard_nms, iou_of

    rng = np.random.default_rng(seed)
    xy = rng.random((n, 2)) * 100
    wh = rng.random((n, 2)) * 50 + 1
    scores = rng.random((n, 1))
    boxes = np.concatenate([xy, xy + wh, scores], axis=1)
    kept = hard_nms(boxes, iou_threshold=0.5)
    for i in range(len(kept)):
        for j in range(i + 1, len(kept)):
            assert iou_of(kept[i, :4], kept[j, :4]) <= 0.5 + 1e-9


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_ser_majority_ids_are_b_or_o(seed):
    """The voted segment id is always 0 or a B- id present (folded) in
    the segment."""
    from paddleocr_spark.kernels.ser import fold_to_b, ser_majority_decode

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 40))
    preds = [int(x) for x in rng.integers(0, 7, n)]
    cuts = sorted({int(x) for x in rng.integers(1, n + 1,
                                                max(1, n // 4))} | {n})
    out = ser_majority_decode(preds, cuts)
    start = 0
    for (pid, label), end in zip(out, cuts):
        seg_folded = {fold_to_b(p) for p in preds[start:end]}
        assert pid in seg_folded or (pid == 0 and not seg_folded)
        assert pid == 0 or pid % 2 == 1
        start = end


@given(st.integers(0, 2**32 - 1), st.integers(1, 40), st.integers(1, 40),
       st.integers(2, 8))
@settings(max_examples=25, deadline=None)
def test_gif_lzw_roundtrip_random_images(seed, w, h, ncolors):
    """ANY palette image round-trips through the independent
    spec-faithful LZW compressor and the library decoder — exercises
    dictionary growth, width bumps, and KwKwK on random data."""
    from paddleocr_spark.kernels.imgcodec import decode_gif
    from tests.test_kernels_imgcodec import _lzw_compress, _wrap_gif

    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (ncolors, 3)).astype(np.uint8)
    idx = rng.integers(0, ncolors, h * w).astype(np.uint8)
    mcs = max(2, int(np.ceil(np.log2(max(ncolors, 2)))))
    out = decode_gif(_wrap_gif(w, h, palette, _lzw_compress(idx, mcs), mcs))
    want = palette[idx.reshape(h, w)][:, :, ::-1]
    assert (out == want).all()


@given(st.integers(0, 2**32 - 1), st.integers(1, 6),
       st.sampled_from(["420", "444", "mono"]))
@settings(max_examples=25, deadline=None)
def test_y4m_roundtrip_any_frames(seed, n_frames, cs):
    from paddleocr_spark.kernels.video import decode_y4m, encode_y4m

    rng = np.random.default_rng(seed)
    h, w = 2 * int(rng.integers(1, 8)), 2 * int(rng.integers(1, 8))
    frames = []
    for _ in range(n_frames):
        f = {"y": rng.integers(0, 256, (h, w), dtype=np.uint8)}
        if cs == "444":
            f["u"] = rng.integers(0, 256, (h, w), dtype=np.uint8)
            f["v"] = rng.integers(0, 256, (h, w), dtype=np.uint8)
        elif cs == "420":
            f["u"] = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
            f["v"] = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        frames.append(f)
    got, meta = decode_y4m(encode_y4m(frames, cs=cs))
    assert meta["n_frames"] == n_frames
    for a, b in zip(frames, got):
        for k in a:
            assert (a[k] == b[k]).all()


@given(st.integers(1, 500), st.integers(1, 50))
@settings(max_examples=50, deadline=None)
def test_frame_sampling_properties(n_frames, n_samples):
    from paddleocr_spark.kernels.video import sample_frame_indices

    idx = sample_frame_indices(n_frames, n_samples)
    assert len(idx) == min(n_samples, n_frames)
    assert idx == sorted(set(idx))            # strictly increasing
    assert all(0 <= i < n_frames for i in idx)


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_otsu_threshold_bounds_and_shift_invariance(seed):
    """t lies in [min, max); shifting all pixels by +c shifts t by c
    (between-class variance is translation-invariant over the
    histogram)."""
    from paddleocr_spark.kernels.preprocess import otsu_threshold

    rng = np.random.default_rng(seed)
    gray = rng.integers(0, 200, (20, 20)).astype(np.uint8)
    t = otsu_threshold(gray)
    assert int(gray.min()) <= t <= int(gray.max())
    shifted = (gray + 50).astype(np.uint8)
    assert otsu_threshold(shifted) == t + 50


@given(st.integers(0, 2**32 - 1), st.integers(0, 8), st.integers(0, 8))
@settings(max_examples=40, deadline=None)
def test_deteval_accumulators_bounded(seed, n_gt, n_det):
    """For ANY sigma/tau tables: each gt contributes at most 1.0 to
    recall and each det at most 1.0 to precision (one-to-one counts 1,
    split/merge matches count fsc_k<1 per participant), and the
    combine ratios stay in [0, 1]."""
    from paddleocr_spark.kernels.det_eval import (
        deteval_combine,
        deteval_sample,
    )

    rng = np.random.default_rng(seed)
    sigma = rng.random((n_gt, n_det))
    tau = rng.random((n_gt, n_det))
    rec, prec, g, d = deteval_sample(sigma, tau)
    assert 0.0 <= rec <= g + 1e-9
    assert 0.0 <= prec <= d + 1e-9
    out = deteval_combine([(rec, prec, g, d)])
    assert 0.0 <= out["recall"] <= 1.0 or g == 0
    assert 0.0 <= out["precision"] <= 1.0 or d == 0
    assert 0.0 <= out["f_score"] <= 1.0
