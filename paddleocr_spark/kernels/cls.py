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
    """probs (N, C) -> list[(label, score)].

    label_list=None falls back to the reference's identity map sized
    to the class axis (``cls.py:17-18``) — NOT to the 2-entry engine
    default, which would IndexError on wider heads; the engine passes
    CLS_LABELS explicitly (config.py's label_list). An explicit empty
    list is a caller bug and raises rather than being silently
    replaced."""
    if label_list is None:
        labels = {i: i for i in range(probs.shape[-1])}
    else:
        if not label_list:
            raise ValueError("cls_decode: empty label_list")
        labels = label_list
    idx = probs.argmax(axis=1)
    return [(labels[i], float(probs[n, i])) for n, i in enumerate(idx)]


def should_rotate(label: str, score: float, thresh: float = 0.5) -> bool:
    return "180" in label and score > thresh
