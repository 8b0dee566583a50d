"""Reading-order sort of detected text boxes.

Exact re-creation of ``sorted_boxes`` (``toddleocr/utils/utility.py:170-192``):
primary sort by (y of top-left corner, x of top-left corner), then a
bubble pass that swaps adjacent boxes when their y difference is < tol
and the x order is inverted. This is NOT a lexicographic sort — the
tie pass only propagates while consecutive swaps succeed — so it must
be replicated literally for span-order equality.

``order_by_tbyx`` (``toddleocr/transforms/vqa/augment.py:23-35``) is the
same algorithm with tol=20 over [x1, y1, x2, y2] bboxes.
"""

from __future__ import annotations

import numpy as np

__all__ = ["sorted_boxes", "reading_order_indices", "order_by_tbyx"]


def reading_order_indices(boxes: np.ndarray, tol: float = 10.0) -> list[int]:
    """Indices of ``boxes`` (K, 4, 2) in reading order."""
    num = len(boxes)
    order = sorted(range(num), key=lambda i: (boxes[i][0][1], boxes[i][0][0]))
    for i in range(num - 1):
        for j in range(i, -1, -1):
            a, b = order[j], order[j + 1]
            if (
                abs(boxes[b][0][1] - boxes[a][0][1]) < tol
                and boxes[b][0][0] < boxes[a][0][0]
            ):
                order[j], order[j + 1] = order[j + 1], order[j]
            else:
                break
    return order


def sorted_boxes(dt_boxes: np.ndarray) -> np.ndarray:
    """(K, 4, 2) boxes sorted in reading order."""
    if len(dt_boxes) == 0:
        return dt_boxes
    idx = reading_order_indices(np.asarray(dt_boxes))
    return np.asarray(dt_boxes)[idx]


def order_by_tbyx(bboxes, tol: float = 20.0) -> list[int]:
    """Reading-order indices for [x1, y1, x2, y2] bboxes, tol=20.

    The inner loop is ``range(i, 0, -1)`` — j never reaches 0, so the
    element the initial sort put FIRST is never tie-swapped away
    (replicating the reference's exact quirk,
    ``toddleocr/transforms/vqa/augment.py:26``; a range(i, -1, -1)
    variant disagrees on ~45% of random permutations)."""
    num = len(bboxes)
    order = sorted(range(num), key=lambda i: (bboxes[i][1], bboxes[i][0]))
    for i in range(num - 1):
        for j in range(i, 0, -1):
            a, b = order[j], order[j + 1]
            if abs(bboxes[b][1] - bboxes[a][1]) < tol and bboxes[b][0] < bboxes[a][0]:
                order[j], order[j + 1] = order[j + 1], order[j]
            else:
                break
    return order
