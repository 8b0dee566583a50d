"""CTC greedy decode — NumPy re-creation of ``CTCLabelDecode``
(``toddleocr/postprocess/rec.py:101-120`` + base decode ``rec.py:71-95``).

Semantics per sequence: argmax over classes, collapse repeated indices
(keep first of each run), drop blank (index 0), map surviving indices
through the character list, confidence = mean of surviving per-step max
probs (0.0 if nothing survives).
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["build_charset", "load_charset_file", "ctc_decode",
           "ctc_decode_batch", "batched_ctc_decode", "wh_ratio_indices",
           "encode_text", "encode_pad",
           "pred_reverse", "DEFAULT_CHARS", "DIGIT_CHARS",
           "REC_BATCH_NUM"]

# 95 printable ASCII (space last, mirroring use_space_char=True which
# appends " " after the dict chars; rec.py:43-44)
DEFAULT_CHARS = [chr(c) for c in range(33, 127)] + [" "]
# ic15-style digit-only dict (toddleocr/utils/dict/ic15_dict.txt shape)
DIGIT_CHARS = [str(d) for d in range(10)]


def build_charset(chars=None):
    """['blank'] + chars, as ``CTCLabelDecode.add_special_char``
    (``rec.py:118-120``)."""
    return ["blank"] + list(chars if chars is not None else DEFAULT_CHARS)


def load_charset_file(path: str, use_space_char: bool = True):
    """Parse a reference-format dict file — one character per line,
    optional trailing space char (``rec.py:36-45``). Returns
    (chars, reverse) where reverse mirrors the ``"arabic" in path``
    RTL switch (``rec.py:46-47``). The char list feeds
    ``build_charset`` and is BROADCAST to executors alongside weights
    (SURVEY §2.1 'weights/dict broadcast')."""
    chars = []
    with open(path, "rb") as fin:
        for line in fin:
            chars.append(line.decode("utf-8").strip("\n").strip("\r\n"))
    if use_space_char:
        chars.append(" ")
    return chars, "arabic" in str(path)


_LTR_RE = re.compile("[a-zA-Z0-9 :*./%+-]")


def pred_reverse(pred: str) -> str:
    """RTL post-fix (``rec.py:54-67``): maximal runs of LTR-safe chars
    keep their internal order; the run sequence is reversed."""
    segs: list[str] = []
    current = ""
    for c in pred:
        if not _LTR_RE.search(c):
            if current:
                segs.append(current)
            segs.append(c)
            current = ""
        else:
            current += c
    if current:
        segs.append(current)
    return "".join(segs[::-1])


def ctc_decode(logits: np.ndarray, charset: list[str],
               reverse: bool = False):
    """One sequence: logits (T, C) -> (text, conf). ``reverse`` applies
    the RTL segment reversal (arabic dicts; ``rec.py:92-93``)."""
    idx = logits.argmax(axis=1)
    prob = logits.max(axis=1)
    selection = np.ones(len(idx), dtype=bool)
    selection[1:] = idx[1:] != idx[:-1]
    selection &= idx != 0
    chars = [charset[i] for i in idx[selection]]
    conf = prob[selection]
    if len(conf) == 0:
        return "", 0.0
    text = "".join(chars)
    if reverse:
        text = pred_reverse(text)
    return text, float(np.mean(conf))


def ctc_decode_batch(logits_batch, charset: list[str],
                     reverse: bool = False):
    """List of (T, C) arrays (ragged T allowed) -> list[(text, conf)]."""
    return [ctc_decode(np.asarray(lg), charset, reverse)
            for lg in logits_batch]


REC_BATCH_NUM = 6  # reference rec/cls micro-batch size (config.py:170-171)


def wh_ratio_indices(boxes) -> np.ndarray:
    """argsort of the crops' w/h ratios (``config.py:387-390``): the
    reference sorts before micro-batching so each batch pads to a
    similar max width ("Sorting can speed up the cls process")."""
    ratios = []
    for b in boxes:
        q = np.asarray(b, dtype=np.float64).reshape(4, 2)
        w = np.linalg.norm(q[0] - q[1])
        h = np.linalg.norm(q[0] - q[3])
        ratios.append(w / max(h, 1e-6))
    return np.argsort(np.asarray(ratios), kind="stable")


def batched_ctc_decode(logits_list, boxes, charset: list[str],
                       batch_num: int = REC_BATCH_NUM,
                       reverse: bool = False):
    """wh-ratio-sorted micro-batched decode with scatter-back to the
    ORIGINAL box order — the reference's rec batching mechanism
    (``config.py:387-416``: ``rec_res[indices[beg + rno]] = ...``).
    With fixture logits each item decodes independently, so results
    equal the unsorted per-box decode; the sort/batch/scatter structure
    is what a real model forward plugs into (batch pads to the chunk's
    max wh ratio)."""
    idx = wh_ratio_indices(boxes)
    out: list = [None] * len(logits_list)
    for beg in range(0, len(idx), batch_num):
        chunk = idx[beg:beg + batch_num]
        for rno, i in enumerate(chunk):
            out[int(idx[beg + rno])] = ctc_decode(
                np.asarray(logits_list[int(i)]), charset, reverse)
    return out


def encode_text(text: str, charset: list[str], max_text_len: int = 25,
                lower: bool = False):
    """char → id encode (``BaseRecLabelEncode.encode``,
    ``toddleocr/transforms/custom/label_ops.py:119-142``): reject
    empty/overlong labels, skip out-of-dict chars, None if nothing
    survives. ``charset`` is the ``build_charset`` list (blank at 0),
    so ids index it directly."""
    if len(text) == 0 or len(text) > max_text_len:
        return None
    if lower:
        text = text.lower()
    lut = _charset_lut(tuple(charset))
    ids = [lut[c] for c in text if c in lut]
    return ids or None


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=8)
def _charset_lut(charset: tuple):
    """char -> id LUT, built once per charset instead of per label (a
    corpus encode pass was rebuilding the same 96-entry dict per
    text; the tuple key is a flat copy, ~3x cheaper, and caches)."""
    return {c: i for i, c in enumerate(charset[1:], start=1)}


def encode_pad(text: str, charset: list[str], max_text_len: int = 25,
               lower: bool = False):
    """``CTCLabelEncode.__call__`` (``label_ops.py:153-166``):
    encode + 0-pad to max_text_len + the ACE per-class count vector.
    Returns (padded_ids, length, ace_counts) or None."""
    ids = encode_text(text, charset, max_text_len, lower)
    if ids is None:
        return None
    length = len(ids)
    padded = ids + [0] * (max_text_len - length)
    ace = [0] * len(charset)
    for x in padded:
        ace[x] += 1
    return padded, length, ace
