"""SER/RE (key-information extraction) decode kernels.

Re-creations of the LayoutXLM post-processors, with the token
classifier replaced by the fixture world's deterministic stand-in:

- BIO label maps          — ``toddleocr/utils/utility.py:126-142``
  (O first, then B-X/I-X per class, upper-cased)
- SER segment decode      — ``VQASerTokenLayoutLMPostProcess._infer``
  (``toddleocr/postprocess/vqa.py:107-147``): per text segment, fold
  I-X onto B-X (label2id_map_for_draw), majority vote via
  bincount-argmax (smallest id wins ties), then the "show" map strips
  the B- prefix.
- RE tail dedup           — ``VQAReTokenLayoutLMPostProcess._infer``
  (``vqa.py:24-41``): first relation per tail_id wins, in prediction
  order.
"""

from __future__ import annotations

import numpy as np

__all__ = ["BIO_CLASSES", "load_bio_label_maps", "fold_to_b",
           "ser_majority_decode", "re_dedup_by_tail", "split_bbox"]

# XFUND-style class set (train_data/XFUND class_list per reference docs)
BIO_CLASSES = ["QUESTION", "ANSWER", "HEADER"]


def load_bio_label_maps(classes=None):
    """O + interleaved B-X/I-X ids (utility.py:137-142)."""
    classes = list(classes if classes is not None else BIO_CLASSES)
    labels = ["O"]
    for c in classes:
        labels.append("B-" + c)
        labels.append("I-" + c)
    label2id = {lab.upper(): i for i, lab in enumerate(labels)}
    id2label = {i: lab.upper() for i, lab in enumerate(labels)}
    return label2id, id2label


def fold_to_b(label_id: int) -> int:
    """label2id_map_for_draw (vqa.py:84-89): I-X ids fold onto their
    B-X id; O stays 0. With the interleaved layout B-ids are odd."""
    if label_id == 0:
        return 0
    return label_id if label_id % 2 == 1 else label_id - 1


def ser_majority_decode(pred_ids, segment_offsets, id2label=None):
    """Token label ids + per-segment end offsets → [(pred_id, label)]
    per segment: fold I→B, bincount-argmax (ties → smallest id), empty
    segment → 0/'O'; the shown label strips the B- prefix
    (vqa.py:127-146)."""
    if id2label is None:
        _, id2label = load_bio_label_maps()
    out = []
    start = 0
    for end in segment_offsets:
        seg = [fold_to_b(int(p)) for p in pred_ids[start:end]]
        if not seg:
            pred_id = 0
        else:
            pred_id = int(np.argmax(np.bincount(seg)))
        label = "O" if pred_id == 0 else id2label[pred_id][2:]
        out.append((pred_id, label))
        start = end
    return out


def re_dedup_by_tail(relations):
    """First relation per tail_id wins, preserving input order
    (vqa.py:30-36 ``used_tail_id``)."""
    seen: set = set()
    out = []
    for rel in relations:
        if rel["tail_id"] in seen:
            continue
        seen.add(rel["tail_id"])
        out.append(rel)
    return out


def split_bbox(bbox, text: str, tokenize=None):
    """Proportional per-token sub-boxes of a text-line bbox —
    ``VQATokenLabelEncode.split_bbox`` (``toddleocr/transforms/custom/
    label_ops.py:987-999``): character-width units, one bbox per
    subword token (repeated per word's token count), inter-word gap of
    one unit. ``tokenize`` maps a word to its subword tokens; default
    is the whitespace stand-in (1 token per word)."""
    words = text.split()
    if tokenize is None:
        tokenize = lambda w: [w]
    x1, y1, x2, y2 = (float(v) for v in bbox)
    unit_w = (x2 - x1) / len(text) if text else 0.0
    out = []
    for word in words:
        curr_w = len(word) * unit_w
        word_bbox = [x1, y1, x1 + curr_w, y2]
        # independent copies: `[lst] * n` would alias ONE list across
        # all subword tokens, so mutating one token's bbox (clipping)
        # would silently change its siblings
        out.extend([list(word_bbox) for _ in range(len(tokenize(word)))])
        x1 += (len(word) + 1) * unit_w
    return out
