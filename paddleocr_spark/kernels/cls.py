"""Text-direction classification decode + rotate predicate.

Re-creates ``ClsPostProcess`` (``toddleocr/postprocess/cls.py:4-30``) and
the 180-degree rotate predicate (``toddleocr/config.py:375-378``): a crop
is rotated when the predicted label contains "180" and its score > thresh.
"""

from __future__ import annotations

import numpy as np

__all__ = ["cls_decode", "should_rotate", "CLS_LABELS"]

CLS_LABELS = ["0", "180"]


def cls_decode(probs: np.ndarray, label_list=None):
    """probs (N, C) -> list[(label, score)]."""
    labels = label_list or CLS_LABELS
    idx = probs.argmax(axis=1)
    return [(labels[i], float(probs[n, i])) for n, i in enumerate(idx)]


def should_rotate(label: str, score: float, thresh: float = 0.5) -> bool:
    return "180" in label and score > thresh
