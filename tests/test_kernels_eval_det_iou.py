"""DetectionIoUEvaluator kernel — mirrors the reference's inline
self-test shape (metrics/_eval_det_iou.py:190-204: 2 GT quads, 1
overlapping pred → precision 1.0, recall 0.5, hmean 2/3)."""

import numpy as np
import pytest

from paddleocr_spark.kernels.eval_det_iou import (
    combine_results,
    evaluate_image,
    poly_intersection_area,
    poly_iou,
)

SQ = lambda x0, y0, s: [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s)]


def test_intersection_identical():
    assert poly_intersection_area(SQ(0, 0, 2), SQ(0, 0, 2)) == pytest.approx(4.0)


def test_intersection_partial():
    assert poly_intersection_area(SQ(0, 0, 2), SQ(1, 1, 2)) == pytest.approx(1.0)


def test_intersection_disjoint():
    assert poly_intersection_area(SQ(0, 0, 1), SQ(5, 5, 1)) == 0.0


def test_iou():
    assert poly_iou(SQ(0, 0, 2), SQ(0, 0, 2)) == pytest.approx(1.0)
    assert poly_iou(SQ(0, 0, 2), SQ(1, 1, 2)) == pytest.approx(1.0 / 7.0)


def test_clockwise_input_handled():
    cw = list(reversed(SQ(0, 0, 2)))
    assert poly_iou(cw, SQ(0, 0, 2)) == pytest.approx(1.0)


def test_clockwise_clip_polygon_handled():
    """The CLIP polygon (2nd arg) drives Sutherland–Hodgman's half-plane
    orientation, so a CW-wound p2 must be re-wound — previously the
    winding check compared the ABSOLUTE shoelace area and never flipped,
    silently zeroing the intersection for CW clip polygons."""
    cw = list(reversed(SQ(0, 0, 2)))
    assert poly_iou(SQ(0, 0, 2), cw) == pytest.approx(1.0)
    assert poly_iou(cw, cw) == pytest.approx(1.0)
    assert poly_iou(SQ(0, 0, 2), list(reversed(SQ(1, 1, 2)))) == pytest.approx(
        1.0 / 7.0
    )


def test_reference_self_test_shape():
    """2 GT, 1 pred overlapping the first → p=1.0, r=0.5, h=2/3."""
    gt = [{"points": SQ(0, 0, 10)}, {"points": SQ(20, 0, 10)}]
    pred = [{"points": SQ(0, 1, 10)}]
    partial = evaluate_image(gt, pred)
    res = combine_results([partial])
    assert res["precision"] == pytest.approx(1.0)
    assert res["recall"] == pytest.approx(0.5)
    assert res["hmean"] == pytest.approx(2 / 3)


def test_dont_care_excluded_both_sides():
    gt = [{"points": SQ(0, 0, 10), "ignore": True},
          {"points": SQ(20, 0, 10)}]
    pred = [{"points": SQ(1, 1, 10)},   # inside don't-care → excluded
            {"points": SQ(20, 0, 10)}]  # matches care GT
    partial = evaluate_image(gt, pred)
    assert partial == (1, 1, 1)
    res = combine_results([partial])
    assert res["hmean"] == pytest.approx(1.0)


def test_greedy_one_to_one():
    """Two preds on one GT: only one match counts."""
    gt = [{"points": SQ(0, 0, 10)}]
    pred = [{"points": SQ(0, 0, 10)}, {"points": SQ(1, 0, 10)}]
    matched, gt_care, det_care = evaluate_image(gt, pred)
    assert (matched, gt_care, det_care) == (1, 1, 2)


def test_combine_empty():
    res = combine_results([])
    assert res["precision"] == 0.0 and res["hmean"] == 0.0


def test_rotated_quad_iou():
    sq = np.array(SQ(0, 0, 2), dtype=float)
    c = np.array([1.0, 1.0])
    th = np.pi / 4
    rot = (sq - c) @ np.array([[np.cos(th), -np.sin(th)],
                               [np.sin(th), np.cos(th)]]) + c
    # 45°-rotated square inside the same square: intersection is the
    # octagon; known ratio = 2*(sqrt(2)-1)... just sanity-bound it
    iou = poly_iou(sq, rot)
    assert 0.5 < iou < 1.0
