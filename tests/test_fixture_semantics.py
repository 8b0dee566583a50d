"""The fixture semantics must make every pipeline stage LOAD-BEARING:
a broken cls-rotate branch or a broken layout NMS must change output
(and therefore fail span equality) — decorative stages verify nothing.
These are pure-Python mutation tests over the shared decode core."""

import numpy as np
import pytest

from paddleocr_spark import corpus, extract_core
from paddleocr_spark.corpus import media_record, select_regions
from paddleocr_spark.extract_core import decode_media_row

REFS = [f"m{i:08d}" for i in range(120)]


@pytest.fixture(scope="module")
def records():
    return {r: media_record(r) for r in REFS}


def test_gt_regions_equal_pipeline_selection(records):
    """gt_regions stored by the generator == what the decode path's
    layout_select computes from the stored candidates."""
    for r, rec in records.items():
        sel = select_regions(rec["cand_boxes"], rec["cand_scores"])
        got = [[*d["bbox"], float(corpus.LAYOUT_CLASSES.index(d["label"]))]
               for d in sel]
        assert np.allclose(np.asarray(got, dtype=np.float64),
                           np.asarray(rec["gt_regions"], dtype=np.float64)), r


def test_corpus_has_multi_region_media(records):
    multi = [r for r, rec in records.items() if len(rec["gt_regions"]) > 1]
    mixed = [r for r, rec in records.items()
             if len({int(reg[5]) for reg in rec["gt_regions"]}) > 1]
    assert len(multi) > 20, "multi-region media must be common"
    assert len(mixed) > 10, "mixed-kind media must exist"


def test_rotation_is_load_bearing(records):
    """Some text-region box must store logits that decode to the
    REVERSED gt text — recoverable only via the rotate predicate."""
    from paddleocr_spark.corpus import CHARSET, REC_C, REC_T, dequantize_logits
    from paddleocr_spark.kernels.ctc import ctc_decode

    hit = 0
    for rec in records.values():
        for i in rec["gt_text_idx"]:
            if rec["cls_probs"][i][1] > rec["cls_probs"][i][0]:  # "180"
                raw, _ = ctc_decode(
                    dequantize_logits(rec["rec_logits"][i], REC_T, REC_C),
                    CHARSET)
                assert raw != rec["gt_texts"][i]
                assert raw[::-1] == rec["gt_texts"][i]
                hit += 1
    assert hit > 5, "corpus must contain rotated boxes"


def test_disabling_rotate_breaks_output(records, monkeypatch):
    """Mutation: a pipeline that skips the rotate branch produces
    different span text — span-sequence equality would fail."""
    baseline = {r: [f["out_text"] for f in decode_media_row(rec)]
                for r, rec in records.items()}
    monkeypatch.setattr(extract_core, "should_rotate",
                        lambda label, score, thresh=0.5: False)
    mutated = {r: [f["out_text"] for f in decode_media_row(rec)]
               for r, rec in records.items()}
    assert baseline != mutated


def test_nms_is_load_bearing(records):
    """Suppressed duplicate candidates must exist: more above-threshold
    candidates than selected regions."""
    suppressed = 0
    for rec in records.values():
        above = sum(1 for s in rec["cand_scores"] if max(s) > 0.4)
        suppressed += above - len(rec["gt_regions"])
    assert suppressed > 20


def test_disabling_nms_breaks_output(records, monkeypatch):
    """Mutation: an identity NMS (keeps every above-threshold
    candidate) yields extra regions → extra fragments."""
    baseline = {r: len(decode_media_row(rec)) for r, rec in records.items()}
    monkeypatch.setattr(corpus, "layout_select",
                        _keep_all_layout_select)
    mutated = {r: len(decode_media_row(rec)) for r, rec in records.items()}
    assert baseline != mutated
    assert sum(mutated.values()) > sum(baseline.values())


def _keep_all_layout_select(boxes, class_scores, score_threshold=0.4,
                            nms_threshold=0.5, keep_top_k=100, labels=None):
    labels = labels or corpus.LAYOUT_CLASSES
    out = []
    for c in range(class_scores.shape[1]):
        for n in range(len(boxes)):
            if class_scores[n, c] > score_threshold:
                out.append({"bbox": [*boxes[n].tolist(),
                                     float(class_scores[n, c])],
                            "label": labels[c]})
    out.sort(key=lambda d: -d["bbox"][4])
    return out


def test_fragment_order_follows_regions(records):
    """Fragments appear in region reading order; text fragments inside
    a region keep global det (sorted_boxes) order."""
    checked = 0
    for rec in records.values():
        frags = decode_media_row(rec)
        regions = select_regions(rec["cand_boxes"], rec["cand_scores"])
        if len(regions) < 2:
            continue
        # map each fragment to its region index
        bounds = [(d["bbox"][1], d["bbox"][3]) for d in regions]
        boxes = rec["gt_boxes"]
        reg_seq = []
        for f in frags:
            if f["box_idx"] >= 0:
                cy = float(np.mean(np.asarray(
                    boxes[f["box_idx"]]).reshape(4, 2)[:, 1]))
                reg_seq.append(next(k for k, (y1, y2) in enumerate(bounds)
                                    if y1 <= cy < y2))
            else:
                # region-level fragment: match by kind emission order
                reg_seq.append(None)
        got = [g for g in reg_seq if g is not None]
        assert got == sorted(got), rec["media_ref"]
        checked += 1
    assert checked > 10
