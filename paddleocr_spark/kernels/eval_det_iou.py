"""Detection IoU evaluator — re-creation of ``DetectionIoUEvaluator``
(``toddleocr/metrics/_eval_det_iou.py:12-187``): greedy 1-1 matching of
GT polygons vs detected polygons at IoU > 0.5, don't-care exclusion on
both sides, and the ``combine_results`` precision/recall/hmean
finalize. The reference uses shapely for polygon area/intersection; we
use a pure-NumPy Sutherland–Hodgman clip (det quads are convex by
construction — minAreaRect outputs).
"""

from __future__ import annotations

import numpy as np

from .geometry import polygon_area

__all__ = ["poly_intersection_area", "poly_iou", "evaluate_image",
           "combine_results"]


def _clip_polygon(subject: np.ndarray, a: np.ndarray, b: np.ndarray):
    """Clip ``subject`` polygon by the half-plane left of edge a→b."""
    out = []
    n = len(subject)
    for i in range(n):
        p, q = subject[i], subject[(i + 1) % n]
        side_p = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        side_q = (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (q[0] - a[0])
        if side_p <= 0:
            out.append(p)
        if (side_p < 0) != (side_q < 0) and side_p != side_q:
            t = side_p / (side_p - side_q)
            out.append(p + t * (q - p))
    return np.array(out) if out else np.zeros((0, 2))


def _signed_area(poly: np.ndarray) -> float:
    """Shoelace area WITH sign (``geometry.polygon_area`` returns the
    absolute value, which made the winding check below vacuous)."""
    x = poly[:, 0]
    y = poly[:, 1]
    xn = np.concatenate((x[1:], x[:1]))
    yn = np.concatenate((y[1:], y[:1]))
    return float(np.sum(x * yn - xn * y)) / 2.0


def _ensure_ccw(poly: np.ndarray) -> np.ndarray:
    return poly if _signed_area(poly) >= 0 else poly[::-1]


def poly_intersection_area(p1: np.ndarray, p2: np.ndarray) -> float:
    """Intersection area of two convex polygons."""
    p1 = _ensure_ccw(np.asarray(p1, dtype=np.float64))
    p2 = _ensure_ccw(np.asarray(p2, dtype=np.float64))
    clipped = p1
    n = len(p2)
    for i in range(n):
        if len(clipped) == 0:
            return 0.0
        clipped = _clip_polygon(clipped, p2[(i + 1) % n], p2[i])
    if len(clipped) < 3:
        return 0.0
    return abs(polygon_area(clipped))


def poly_iou(p1, p2) -> float:
    inter = poly_intersection_area(p1, p2)
    a1 = abs(polygon_area(np.asarray(p1, dtype=np.float64)))
    a2 = abs(polygon_area(np.asarray(p2, dtype=np.float64)))
    union = a1 + a2 - inter
    return inter / union if union > 0 else 0.0


def evaluate_image(gt, pred, iou_thresh: float = 0.5):
    """gt: list of {"points": (4,2) array-like, "ignore": bool};
    pred: list of {"points": ...}. Returns per-image partials
    (det_matched, gt_care, det_care) — the accumulate step of
    ``evaluate_image`` (``_eval_det_iou.py:12-161``)."""
    gt_polys, gt_ignore = [], []
    for g in gt:
        pts = np.asarray(g["points"], dtype=np.float64)
        gt_polys.append(pts)
        gt_ignore.append(bool(g.get("ignore", False)))

    det_polys, det_ignore = [], []
    for p in pred:
        pts = np.asarray(p["points"], dtype=np.float64)
        det_polys.append(pts)
        # a det overlapping a don't-care GT by >50% of its own area is
        # excluded from detCare (_eval_det_iou.py:97-109)
        ignore = False
        d_area = abs(polygon_area(pts))
        for gp, gi in zip(gt_polys, gt_ignore):
            if gi and d_area > 0:
                if poly_intersection_area(pts, gp) / d_area > 0.5:
                    ignore = True
                    break
        det_ignore.append(ignore)

    gt_matched = [False] * len(gt_polys)
    det_matched_flags = [False] * len(det_polys)
    det_matched = 0
    for i, (gp, gi) in enumerate(zip(gt_polys, gt_ignore)):
        if gi:
            continue
        for j, (dp, di) in enumerate(zip(det_polys, det_ignore)):
            if di or det_matched_flags[j]:
                continue
            if poly_iou(gp, dp) > iou_thresh:
                gt_matched[i] = True
                det_matched_flags[j] = True
                det_matched += 1
                break
    gt_care = sum(1 for g in gt_ignore if not g)
    det_care = sum(1 for d in det_ignore if not d)
    return det_matched, gt_care, det_care


def combine_results(partials):
    """(matched, gt_care, det_care) rows → precision/recall/hmean
    (``_eval_det_iou.py:163-187``)."""
    m = sum(p[0] for p in partials)
    g = sum(p[1] for p in partials)
    d = sum(p[2] for p in partials)
    precision = 0.0 if d == 0 else m / d
    recall = 0.0 if g == 0 else m / g
    hmean = 0.0 if precision + recall == 0 else \
        2 * precision * recall / (precision + recall)
    return {"precision": precision, "recall": recall, "hmean": hmean,
            "matched": m, "gt_care": g, "det_care": d}
