"""Layout-region NMS — re-creation of the PicoDet post-process core
(``toddleocr/postprocess/picodet.py:5-64``): greedy hard NMS over
corner-form boxes plus the standard IoU helper, and a small
per-class driver mirroring how the layout head filters by score then
suppresses per class before a global keep_top_k.
"""

from __future__ import annotations

import numpy as np

__all__ = ["iou_of", "hard_nms", "layout_select", "LAYOUT_LABELS"]

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
