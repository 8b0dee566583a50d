"""CTC greedy decode — NumPy re-creation of ``CTCLabelDecode``
(``toddleocr/postprocess/rec.py:101-120`` + base decode ``rec.py:71-95``).

Semantics per sequence: argmax over classes, collapse repeated indices
(keep first of each run), drop blank (index 0), map surviving indices
through the character list, confidence = mean of surviving per-step max
probs (0.0 if nothing survives).
"""

from __future__ import annotations

import numpy as np

__all__ = ["build_charset", "ctc_decode", "ctc_decode_batch", "DEFAULT_CHARS"]

# 95 printable ASCII (space last, mirroring use_space_char=True which
# appends " " after the dict chars; rec.py:43-44)
DEFAULT_CHARS = [chr(c) for c in range(33, 127)] + [" "]


def build_charset(chars=None):
    """['blank'] + chars, as ``CTCLabelDecode.add_special_char``
    (``rec.py:118-120``)."""
    return ["blank"] + list(chars if chars is not None else DEFAULT_CHARS)


def ctc_decode(logits: np.ndarray, charset: list[str]):
    """One sequence: logits (T, C) -> (text, conf)."""
    idx = logits.argmax(axis=1)
    prob = logits.max(axis=1)
    selection = np.ones(len(idx), dtype=bool)
    selection[1:] = idx[1:] != idx[:-1]
    selection &= idx != 0
    chars = [charset[i] for i in idx[selection]]
    conf = prob[selection]
    if len(conf) == 0:
        return "", 0.0
    return "".join(chars), float(np.mean(conf))


def ctc_decode_batch(logits_batch, charset: list[str]):
    """List of (T, C) arrays (ragged T allowed) -> list[(text, conf)]."""
    return [ctc_decode(np.asarray(lg), charset) for lg in logits_batch]
