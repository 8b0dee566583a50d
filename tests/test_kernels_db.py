import numpy as np
import pytest

from paddleocr_spark.kernels.db import (
    DBParams,
    boxes_from_bitmap,
    db_postprocess,
    filter_tag_det_res,
    get_mini_boxes,
    order_points_clockwise,
)


def rect_map(h, w, rects, bg=0.05):
    m = np.full((h, w), bg, dtype=np.float32)
    for (x0, y0, x1, y1, p) in rects:
        m[y0 : y1 + 1, x0 : x1 + 1] = p
    return m


def expected_box(x0, y0, x1, y1, W, H, sW, sH, ratio=2.0):
    """Analytic expectation of the DB quad pipeline for an axis-aligned
    high-prob rectangle: unclip by d = area*ratio/perimeter, rescale with
    np.round, clip to [0, dest]."""
    w, h = float(x1 - x0), float(y1 - y0)
    d = (w * h) * ratio / (2 * (w + h))
    xs = np.clip(np.round(np.array([x0 - d, x1 + d]) / W * sW), 0, sW)
    ys = np.clip(np.round(np.array([y0 - d, y1 + d]) / H * sH), 0, sH)
    return np.array(
        [[xs[0], ys[0]], [xs[1], ys[0]], [xs[1], ys[1]], [xs[0], ys[1]]], dtype=np.int32
    )


def test_single_box_analytic():
    H, W = 96, 128
    pm = rect_map(H, W, [(20, 30, 60, 45, 0.9)])
    boxes, scores = boxes_from_bitmap(pm, pm > 0.3, W * 2, H * 2)
    assert len(boxes) == 1
    np.testing.assert_array_equal(boxes[0], expected_box(20, 30, 60, 45, W, H, W * 2, H * 2))
    assert scores[0] == pytest.approx(0.9, abs=1e-6)


def test_weak_box_dropped_by_box_thresh():
    # passes binarization thresh (0.3) but mean score 0.5 < box_thresh 0.7
    H, W = 96, 128
    pm = rect_map(H, W, [(20, 30, 60, 45, 0.5)])
    boxes, _ = boxes_from_bitmap(pm, pm > 0.3, W * 2, H * 2)
    assert len(boxes) == 0


def test_tiny_box_dropped_by_min_size():
    H, W = 96, 128
    pm = rect_map(H, W, [(20, 30, 22, 32, 0.9)])  # 3x3 px => sside 2 < 3
    boxes, _ = boxes_from_bitmap(pm, pm > 0.3, W * 2, H * 2)
    assert len(boxes) == 0


def test_multiple_boxes_and_filters_mixed():
    H, W = 160, 224
    pm = rect_map(
        H,
        W,
        [
            (10, 10, 60, 25, 0.92),   # kept
            (100, 10, 180, 30, 0.85), # kept
            (10, 60, 80, 80, 0.45),   # dropped: score
            (150, 100, 152, 102, 0.9),# dropped: min_size
            (20, 110, 90, 140, 0.88), # kept
        ],
    )
    boxes, scores = boxes_from_bitmap(pm, pm > 0.3, W, H)
    assert len(boxes) == 3
    exp = [
        expected_box(10, 10, 60, 25, W, H, W, H),
        expected_box(100, 10, 180, 30, W, H, W, H),
        expected_box(20, 110, 90, 140, W, H, W, H),
    ]
    got = {tuple(b.flatten()) for b in boxes}
    want = {tuple(b.flatten()) for b in exp}
    assert got == want


def test_db_postprocess_end_to_end_with_filter():
    H, W = 96, 128
    pm = rect_map(H, W, [(20, 30, 60, 45, 0.9)])
    out = db_postprocess(pm, [H * 2.0, W * 2.0, 0.5, 0.5])
    assert out.shape == (1, 4, 2)
    exp = expected_box(20, 30, 60, 45, W, H, W * 2, H * 2).astype(np.float32)
    # filter_tag_det_res clips to [0, dim-1]
    exp[:, 0] = np.clip(exp[:, 0], 0, W * 2 - 1)
    exp[:, 1] = np.clip(exp[:, 1], 0, H * 2 - 1)
    np.testing.assert_array_equal(out[0], exp)


def test_order_points_clockwise():
    pts = np.array([[50, 30], [10, 10], [10, 30], [50, 10]], dtype=float)
    out = order_points_clockwise(pts)
    np.testing.assert_array_equal(
        out, np.array([[10, 10], [50, 10], [50, 30], [10, 30]], dtype=np.float32)
    )


def test_filter_tag_det_res_drops_thin():
    boxes = np.array(
        [
            [[0, 0], [100, 0], [100, 2], [0, 2]],     # height 2 -> dropped
            [[0, 0], [100, 0], [100, 30], [0, 30]],   # kept
        ],
        dtype=np.float64,
    )
    out = filter_tag_det_res(boxes, 200, 200)
    assert out.shape == (1, 4, 2)


def test_get_mini_boxes_corner_order():
    pts = np.array([[10, 20], [50, 20], [50, 35], [10, 35]])
    box, sside = get_mini_boxes(pts)
    assert sside == pytest.approx(15.0)
    np.testing.assert_allclose(
        box, [[10, 20], [50, 20], [50, 35], [10, 35]], atol=1e-9
    )


def test_max_candidates_cap():
    H, W = 64, 640
    rects = [(i * 12, 10, i * 12 + 6, 40, 0.9) for i in range(50)]
    pm = rect_map(H, W, rects)
    boxes, _ = boxes_from_bitmap(pm, pm > 0.3, W, H, DBParams(max_candidates=10))
    assert len(boxes) == 10
