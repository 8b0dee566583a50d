"""DB (Differentiable Binarization) detection post-processing.

From-scratch NumPy re-creation of the reference semantics:

- ``DBPostProcess.boxes_from_bitmap`` — ``toddleocr/postprocess/db.py:86-132``
- ``get_mini_boxes`` corner ordering    — ``db.py:142-161``
- ``box_score_fast``                    — ``db.py:163-178``
- ``unclip``                            — ``db.py:134-140``
- ``filter_tag_det_res`` (clipping inlined) / ``order_points_clockwise``
                                        — ``toddleocr/utils/utility.py:216-249``

Pipeline per prob map: threshold-binarize -> connected components ->
min-area rect (drop sside < min_size) -> bbox-mask mean score (drop
score < box_thresh) -> unclip by area*ratio/perimeter -> min-area rect
again (drop sside < min_size + 2) -> rescale to source image coords,
round + clip -> int32 quads -> clockwise-order, clip to image, drop
quads with a side <= 3 px.
"""

from __future__ import annotations

import math

import numpy as np

from .geometry import (
    connected_components,
    min_area_rect,
    polygon_mask_mean,
    unclip_rect,
)

__all__ = ["DBParams", "boxes_from_bitmap", "db_postprocess",
           "filter_tag_det_res", "component_score_slow"]


class DBParams:
    """Defaults mirror the reference (``db.py:13-36``)."""

    def __init__(
        self,
        thresh: float = 0.3,
        box_thresh: float = 0.7,
        max_candidates: int = 1000,
        unclip_ratio: float = 2.0,
        min_size: int = 3,
        score_mode: str = "fast",
    ):
        assert score_mode in ("fast", "slow"), score_mode
        self.thresh = thresh
        self.box_thresh = box_thresh
        self.max_candidates = max_candidates
        self.unclip_ratio = unclip_ratio
        self.min_size = min_size
        self.score_mode = score_mode


def component_score_slow(pred: np.ndarray, run_points: np.ndarray) -> float:
    """``box_score_slow`` (``db.py:180-199``): mean of the prob map
    over the component's OWN region rather than its min-rect bbox mask.
    The reference rasterizes the contour with fillPoly; our connected
    components carry run endpoints (alternating left/right per row), so
    the exact region mean is the sum over the row spans — equivalent
    for any FILLED component shape, including non-convex ones.

    Known divergence, components with interior HOLES: fillPoly of the
    outer contour includes hole pixels in the reference's mean (and
    cv2.findContours RETR_LIST additionally emits each hole contour as
    its own candidate), while the run-span sum covers foreground
    pixels only. The DB binarization map in this corpus never produces
    holed components (thresholded blobs of filled text boxes), so the
    equivalence holds on every decoded input; a holed component would
    need an enclosed-background fill pass here to match bit-for-bit."""
    total = 0.0
    count = 0
    for k in range(0, len(run_points), 2):
        x0, y = int(run_points[k][0]), int(run_points[k][1])
        x1 = int(run_points[k + 1][0])
        seg = pred[y, x0:x1 + 1]
        total += float(seg.sum())
        count += seg.size
    return total / count if count else 0.0


def get_mini_boxes(points: np.ndarray):
    """Min-area rect of ``points`` with the reference's canonical corner
    order (sort by x, then resolve top/bottom per side; ``db.py:142-161``).

    Returns (box (4,2) float64 ordered [tl, tr, br, bl]-ish, sside).
    """
    corners, (w, h) = min_area_rect(points)
    pts = sorted(corners.tolist(), key=lambda p: p[0])
    if pts[1][1] > pts[0][1]:
        i1, i4 = 0, 1
    else:
        i1, i4 = 1, 0
    if pts[3][1] > pts[2][1]:
        i2, i3 = 2, 3
    else:
        i2, i3 = 3, 2
    box = np.array([pts[i1], pts[i2], pts[i3], pts[i4]])
    return box, min(w, h)


def boxes_from_bitmap(
    pred: np.ndarray,
    bitmap: np.ndarray,
    dest_width: float,
    dest_height: float,
    params: DBParams | None = None,
):
    """Binary map -> scored int32 quads in destination coords.

    ``pred``: float prob map (H, W); ``bitmap``: bool map (H, W).
    Returns (boxes (K,4,2) int32, scores list[float]).
    """
    p = params or DBParams()
    height, width = bitmap.shape
    comps = connected_components(bitmap, connectivity=8)[: p.max_candidates]
    boxes = []
    scores = []
    for pts in comps:
        box, sside = get_mini_boxes(pts)
        if sside < p.min_size:
            continue
        if p.score_mode == "slow":
            score = component_score_slow(pred, pts)
        else:
            score = polygon_mask_mean(pred, box)
        if p.box_thresh > score:
            continue
        expanded = unclip_rect(box, p.unclip_ratio)
        box, sside = get_mini_boxes(expanded)
        if sside < p.min_size + 2:
            continue
        # rescale to dest coords with Python floats: round() is the
        # same round-half-even as np.round on float64, clip is pure
        # comparison, int32 cast of an integral value is exact
        boxes.append(
            np.array(
                [
                    [
                        int(min(max(float(round(x / width * dest_width)), 0.0),
                                dest_width)),
                        int(min(max(float(round(y / height * dest_height)), 0.0),
                                dest_height)),
                    ]
                    for x, y in box.tolist()
                ],
                dtype="int32",
            )
        )
        scores.append(score)
    if boxes:
        return np.array(boxes, dtype="int32"), scores
    return np.zeros((0, 4, 2), dtype="int32"), scores


def _order_points_clockwise_rows(p: list) -> list:
    """``order_points_clockwise`` on 4 [x, y] rows, returning the
    reordered rows. Pure selection — tie-breaking replicates
    np.argmin/argmax (first occurrence) and np.delete's duplicate-index
    dedup (argmin == argmax leaves three rows, not two)."""
    s = [q[0] + q[1] for q in p]
    imin = s.index(min(s))
    imax = s.index(max(s))
    rem = [p[i] for i in range(4) if i != imin and i != imax]
    d = [q[1] - q[0] for q in rem]
    return [p[imin], rem[d.index(min(d))], p[imax], rem[d.index(max(d))]]


def order_points_clockwise(pts: np.ndarray) -> np.ndarray:
    """Canonical tl/tr/br/bl order by coord-sum / coord-diff
    (``utility.py:216-225``)."""
    rows = _order_points_clockwise_rows(
        np.asarray(pts, dtype=np.float64).tolist()
    )
    return np.array(rows, dtype="float32")


def filter_tag_det_res(dt_boxes: np.ndarray, img_height: int, img_width: int):
    """Clockwise-order, clip to image, drop boxes with any side <= 3 px
    (``utility.py:235-249``). Returns (K, 4, 2) float32.

    Inner loop runs on Python floats. Input boxes carry integer-valued
    coordinates (``boxes_from_bitmap`` emits int32 quads), so the
    float32 round-trip of the original per-box ndarray pipeline is
    exact, clipping is pure comparison, and the side lengths are
    sqrt of exact integers < 2**26 — where float32 and float64 sqrt
    truncate to the same int (an irrational sqrt(n) sits >= ~1/(2*
    sqrt(n)) from the nearest integer, far beyond f32's ulp here).
    Verified bit-identical to the previous ndarray formulation by a
    randomized differential test.
    """
    out = []
    wmax = img_width - 1
    hmax = img_height - 1
    for box in dt_boxes:
        rows = _order_points_clockwise_rows(
            np.asarray(box, dtype=np.float64).tolist()
        )
        clipped = [
            (
                float(int(min(max(x, 0.0), wmax))),
                float(int(min(max(y, 0.0), hmax))),
            )
            for x, y in rows
        ]
        dx = clipped[0][0] - clipped[1][0]
        dy = clipped[0][1] - clipped[1][1]
        rect_width = int(math.sqrt(dx * dx + dy * dy))
        dx = clipped[0][0] - clipped[3][0]
        dy = clipped[0][1] - clipped[3][1]
        rect_height = int(math.sqrt(dx * dx + dy * dy))
        if rect_width <= 3 or rect_height <= 3:
            continue
        out.append(clipped)
    if out:
        return np.array(out, dtype=np.float32)
    return np.zeros((0, 4, 2), dtype=np.float32)


def db_postprocess(
    prob_map: np.ndarray,
    shape_list,
    params: DBParams | None = None,
):
    """Full det stage for one media item: prob map (H, W) + shape_list
    [src_h, src_w, ratio_h, ratio_w] -> filtered quads (K,4,2) float32
    in source-image coordinates. Mirrors ``DBPostProcess.__call__``
    (``db.py:201-230``) followed by ``filter_tag_det_res``."""
    p = params or DBParams()
    src_h, src_w = float(shape_list[0]), float(shape_list[1])
    segmentation = prob_map > p.thresh
    boxes, _scores = boxes_from_bitmap(prob_map, segmentation, src_w, src_h, p)
    return filter_tag_det_res(boxes, int(src_h), int(src_w))
