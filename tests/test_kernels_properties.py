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
