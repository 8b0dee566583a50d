"""Layout-region NMS — re-creation of the PicoDet post-process core
(``toddleocr/postprocess/picodet.py:5-64``): greedy hard NMS over
corner-form boxes plus the standard IoU helper, and a small
per-class driver mirroring how the layout head filters by score then
suppresses per class before a global keep_top_k.
"""

from __future__ import annotations

import numpy as np

# module-level: quad_iou runs in the O(N^2) inner loops of the NMS
# variants — a function-body import would pay the sys.modules lookup
# per IoU call (no cycle: eval_det_iou depends only on geometry)
from .eval_det_iou import poly_iou as _poly_iou

__all__ = ["iou_of", "hard_nms", "layout_select", "LAYOUT_LABELS",
           "quad_iou", "weighted_merge", "standard_nms", "nms_locality",
           "soft_nms"]

# minimal layout vocabulary (reference ships CDLA/publaynet dicts with
# text/title/figure/table/... under toddleocr/utils/dict/layout_dict/)
LAYOUT_LABELS = ["text_block", "table", "figure"]


def _area_of(left_top: np.ndarray, right_bottom: np.ndarray) -> np.ndarray:
    hw = np.clip(right_bottom - left_top, 0.0, None)
    return hw[..., 0] * hw[..., 1]


def iou_of(boxes0: np.ndarray, boxes1: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    """IoU of corner-form boxes (``picodet.py:37-53``)."""
    overlap_lt = np.maximum(boxes0[..., :2], boxes1[..., :2])
    overlap_rb = np.minimum(boxes0[..., 2:], boxes1[..., 2:])
    overlap = _area_of(overlap_lt, overlap_rb)
    a0 = _area_of(boxes0[..., :2], boxes0[..., 2:])
    a1 = _area_of(boxes1[..., :2], boxes1[..., 2:])
    return overlap / (a0 + a1 - overlap + eps)


def hard_nms(
    box_scores: np.ndarray,
    iou_threshold: float = 0.5,
    top_k: int = -1,
    candidate_size: int = 200,
) -> np.ndarray:
    """Greedy score-descending IoU suppression (``picodet.py:5-34``).

    box_scores: (N, 5) [x1, y1, x2, y2, score]; returns kept rows.
    """
    scores = box_scores[:, -1]
    boxes = box_scores[:, :-1]
    picked: list[int] = []
    indexes = np.argsort(scores)
    indexes = indexes[-candidate_size:]
    while len(indexes) > 0:
        current = indexes[-1]
        picked.append(int(current))
        if 0 < top_k == len(picked) or len(indexes) == 1:
            break
        current_box = boxes[current, :]
        indexes = indexes[:-1]
        rest = boxes[indexes, :]
        iou = iou_of(rest, np.expand_dims(current_box, axis=0))
        indexes = indexes[iou <= iou_threshold]
    return box_scores[picked, :]


def layout_select(
    boxes: np.ndarray,
    class_scores: np.ndarray,
    score_threshold: float = 0.4,
    nms_threshold: float = 0.5,
    keep_top_k: int = 100,
    labels=None,
):
    """Per-class score filter + hard NMS + global top-k, as the PicoDet
    head does per feature level (``picodet.py:155-186``).

    boxes: (N, 4) corner-form candidates; class_scores: (N, C).
    Returns list of dicts {"bbox": [x1,y1,x2,y2,score], "label": str}
    sorted by descending score.
    """
    labels = labels or LAYOUT_LABELS
    out = []
    for c in range(class_scores.shape[1]):
        sc = class_scores[:, c]
        mask = sc > score_threshold
        if not mask.any():
            continue
        bs = np.concatenate([boxes[mask], sc[mask, None]], axis=1)
        kept = hard_nms(bs, iou_threshold=nms_threshold, top_k=keep_top_k)
        for row in kept:
            out.append({"bbox": row.tolist(), "label": labels[c]})
    out.sort(key=lambda d: -d["bbox"][4])
    return out[:keep_top_k]


# --- EAST/SAST quad-NMS family (toddleocr/ops/locality_aware_nms.py) -
# N x 9 rows: 8 quad coords (x1..y4) + score. The reference computes
# quad IoU with shapely; these use the repo's convex-polygon clip
# (exact for the convex quads EAST/SAST emit).

def quad_iou(g: np.ndarray, p: np.ndarray) -> float:
    """IoU of two 9-vectors' quads (``locality_aware_nms.py:10-26``)."""
    return _poly_iou(np.asarray(g[:8], dtype=np.float64).reshape(4, 2),
                     np.asarray(p[:8], dtype=np.float64).reshape(4, 2))


def weighted_merge(g: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Score-weighted coordinate merge; scores add
    (``locality_aware_nms.py:46-52``)."""
    g = g.copy()
    g[:8] = (g[8] * g[:8] + p[8] * p[:8]) / (g[8] + p[8])
    g[8] = g[8] + p[8]
    return g


def standard_nms(S: np.ndarray, thres: float) -> np.ndarray:
    """Greedy score-descending quad NMS (``locality_aware_nms.py:
    55-69``)."""
    S = np.asarray(S, dtype=np.float64)
    order = np.argsort(S[:, 8])[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        ovr = np.array([quad_iou(S[i], S[t]) for t in order[1:]])
        order = order[1:][ovr <= thres]
    return S[keep]


def nms_locality(polys: np.ndarray, thres: float = 0.3) -> np.ndarray:
    """EAST locality-aware NMS (``locality_aware_nms.py:173-193``):
    one row-order pass weighted-merging consecutive overlapping quads
    (exploits the row-major geometry decode order), then standard NMS
    over the merged set — O(N) merges before the O(k²) NMS."""
    S: list[np.ndarray] = []
    p = None
    for g in np.asarray(polys, dtype=np.float64):
        if p is not None and quad_iou(g, p) > thres:
            p = weighted_merge(g, p)
        else:
            if p is not None:
                S.append(p)
            p = g
    if p is not None:
        S.append(p)
    if not S:
        return np.array([])
    return standard_nms(np.array(S), thres)


def soft_nms(boxes_in: np.ndarray, nt_thres: float = 0.3,
             threshold: float = 0.8, sigma: float = 0.5,
             method: int = 2) -> np.ndarray:
    """Soft-NMS over quads (``locality_aware_nms.py:106-170``):
    overlapping boxes have their scores decayed (method 1 linear
    ``1-iou`` past nt_thres, 2 gaussian ``exp(-iou²/σ)``, else hard
    zeroing) and are dropped only when the decayed score falls below
    ``threshold`` — the same selection-sort + in-place compaction loop
    as the reference."""
    boxes = np.asarray(boxes_in, dtype=np.float64).copy()
    n = boxes.shape[0]
    if n < 1:
        return np.array([])
    for i in range(n):
        if i >= n:  # compaction shrank past the cursor
            break
        # selection-sort the max-score remaining box into slot i
        maxpos = i + int(np.argmax(boxes[i:n, 8]))
        boxes[[i, maxpos]] = boxes[[maxpos, i]]
        tbox = boxes[i]
        pos = i + 1
        while pos < n:
            iou = quad_iou(tbox, boxes[pos])
            if iou > 0:
                if method == 1:
                    weight = 1 - iou if iou > nt_thres else 1.0
                elif method == 2:
                    weight = float(np.exp(-(iou ** 2) / sigma))
                else:
                    weight = 0.0 if iou > nt_thres else 1.0
                boxes[pos, 8] *= weight
                if boxes[pos, 8] < threshold:
                    boxes[pos] = boxes[n - 1]
                    n -= 1
                    pos -= 1
            pos += 1
    return boxes[:n]
