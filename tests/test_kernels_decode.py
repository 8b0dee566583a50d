import numpy as np
import pytest

from paddleocr_spark.kernels.cls import CLS_LABELS, cls_decode, should_rotate
from paddleocr_spark.kernels.ctc import build_charset, ctc_decode, ctc_decode_batch
from paddleocr_spark.kernels.nms import hard_nms, iou_of, layout_select
from paddleocr_spark.kernels.reading_order import (
    order_by_tbyx,
    reading_order_indices,
    sorted_boxes,
)
from paddleocr_spark.kernels.table import TableVocab, table_decode, wrap_html
from paddleocr_spark.kernels.matcher import (
    compute_iou,
    distance,
    filter_ocr_result,
    get_pred_html,
    match_result,
)


def logits_for(path, C, p=0.9):
    """(T, C) logits whose argmax follows `path` with max-prob p, others
    uniform low."""
    T = len(path)
    lg = np.full((T, C), (1 - p) / (C - 1), dtype=np.float32)
    for t, c in enumerate(path):
        lg[t, c] = p
    return lg


def test_ctc_collapse_and_blank():
    charset = build_charset(list("abc"))  # blank,a=1,b=2,c=3
    # path: a a blank a b b -> "aab"
    lg = logits_for([1, 1, 0, 1, 2, 2], len(charset))
    text, conf = ctc_decode(lg, charset)
    assert text == "aab"
    assert conf == pytest.approx(0.9)


def test_ctc_all_blank_zero_conf():
    charset = build_charset(list("abc"))
    lg = logits_for([0, 0, 0], len(charset))
    text, conf = ctc_decode(lg, charset)
    assert text == "" and conf == 0.0


def test_ctc_varied_probs_mean_conf():
    charset = build_charset(list("xy"))
    lg = logits_for([1, 0, 2], len(charset))
    lg[0, 1] = 0.8
    lg[2, 2] = 0.6
    text, conf = ctc_decode(lg, charset)
    assert text == "xy"
    assert conf == pytest.approx((0.8 + 0.6) / 2)


def test_ctc_batch():
    charset = build_charset(list("ab"))
    out = ctc_decode_batch(
        [logits_for([1, 1], len(charset)), logits_for([2, 0, 1], len(charset))], charset
    )
    assert [t for t, _ in out] == ["a", "ba"]


def test_cls_decode_and_rotate():
    probs = np.array([[0.9, 0.1], [0.2, 0.8], [0.45, 0.55]])
    out = cls_decode(probs, CLS_LABELS)
    assert out[0] == ("0", pytest.approx(0.9))
    assert out[1] == ("180", pytest.approx(0.8))
    assert should_rotate(*out[1])
    assert not should_rotate(*out[0])
    assert not should_rotate("180", 0.4)


def test_cls_decode_none_is_identity_map():
    # ClsPostProcess with label_list=None maps class index -> itself
    # (reference cls.py:17-18), even for heads wider than 2 classes
    probs = np.array([[0.1, 0.2, 0.7], [0.6, 0.3, 0.1]])
    out = cls_decode(probs)
    assert out == [(2, pytest.approx(0.7)), (0, pytest.approx(0.6))]
    with pytest.raises(ValueError):
        cls_decode(probs, [])


def box(y, x, w=30, h=10):
    return np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]], dtype=float)


def test_reading_order_simple_rows():
    boxes = np.array([box(50, 10), box(10, 40), box(10, 5), box(50, 80)])
    idx = reading_order_indices(boxes)
    assert idx == [2, 1, 0, 3]


def test_reading_order_y_tolerance_bubble():
    # same visual row with |dy| < 10: x order must win
    boxes = np.array([box(12, 100), box(8, 50), box(15, 10)])
    out = sorted_boxes(boxes)
    xs = [b[0][0] for b in out]
    assert xs == [10, 50, 100]


def test_reading_order_tolerance_boundary():
    # dy exactly 10 -> NO swap (strict <)
    boxes = np.array([box(20, 10), box(10, 90)])
    idx = reading_order_indices(boxes)
    assert idx == [1, 0]


def test_reading_order_bubble_stops_at_first_failure():
    # replicate the reference's early-break semantics: a box can only
    # bubble left while consecutive swaps succeed
    boxes = np.array([box(0, 10), box(30, 20), box(33, 5)])
    idx = reading_order_indices(boxes)
    assert idx == [0, 2, 1]


def test_order_by_tbyx():
    bb = [[100, 12, 130, 22], [50, 8, 80, 18], [10, 40, 40, 50]]
    assert order_by_tbyx(bb) == [1, 0, 2]


def test_order_by_tbyx_never_swaps_position_zero():
    """Reference quirk (augment.py:26, range(i, 0, -1)): the first
    element after the (y, x) sort is never tie-swapped away, even when
    a same-row box with smaller x follows it."""
    bb = [[100, 0, 110, 10], [0, 5, 10, 15]]
    # sort by (y1, x1) -> [0, 1]; j range(0, 0, -1) is empty, so NO
    # swap happens despite |5-0| < 20 and 0 < 100
    assert order_by_tbyx(bb) == [0, 1]


def test_iou_of():
    a = np.array([[0, 0, 10, 10]], dtype=float)
    b = np.array([[5, 5, 15, 15]], dtype=float)
    assert iou_of(a, b)[0] == pytest.approx(25 / 175, abs=1e-4)


def test_hard_nms_suppresses_overlaps():
    bs = np.array(
        [
            [0, 0, 10, 10, 0.9],
            [1, 1, 11, 11, 0.8],   # IoU with first > 0.5 -> suppressed
            [50, 50, 60, 60, 0.7],
        ]
    )
    kept = hard_nms(bs, iou_threshold=0.5)
    assert len(kept) == 2
    assert kept[0][4] == 0.9 and kept[1][4] == 0.7


def test_layout_select_per_class():
    boxes = np.array([[0, 0, 100, 40], [0, 50, 100, 90], [2, 2, 98, 38]], dtype=float)
    scores = np.array(
        [[0.9, 0.05, 0.05], [0.1, 0.8, 0.1], [0.85, 0.1, 0.05]]  # 3rd overlaps 1st
    )
    out = layout_select(boxes, scores)
    assert [d["label"] for d in out] == ["text_block", "table"]


def test_table_decode_and_html():
    vocab = TableVocab()
    V = len(vocab.character)
    td = vocab.dict["<td></td>"]
    tr, trc = vocab.dict["<tr>"], vocab.dict["</tr>"]
    tb, tbc = vocab.dict["<tbody>"], vocab.dict["</tbody>"]
    path = [tb, tr, td, td, trc, tbc, vocab.eos, td]
    probs = np.full((len(path), V), 0.001, dtype=np.float32)
    for t, c in enumerate(path):
        probs[t, c] = 0.95
    locs = np.zeros((len(path), 8), dtype=np.float32)
    locs[2] = [0.1, 0.1, 0.5, 0.1, 0.5, 0.3, 0.1, 0.3]
    locs[3] = [0.5, 0.1, 0.9, 0.1, 0.9, 0.3, 0.5, 0.3]
    tokens, bboxes, score = table_decode(probs, locs, [100.0, 200.0])
    assert tokens == ["<tbody>", "<tr>", "<td></td>", "<td></td>", "</tr>", "</tbody>"]
    assert bboxes.shape == (2, 8)
    np.testing.assert_allclose(bboxes[0], [20, 10, 100, 10, 100, 30, 20, 30])
    assert score == pytest.approx(0.95, abs=1e-6)
    assert wrap_html("<tr></tr>") == "<html><body><table><tr></tr></table></body></html>"


def test_match_result_iou_then_distance():
    cells = [
        [0, 0, 100, 0, 100, 20, 0, 20],     # cell 0 (8-point)
        [0, 30, 100, 30, 100, 50, 0, 50],   # cell 1
    ]
    dt = [[5, 2, 60, 18], [10, 32, 80, 48], [70, 1, 95, 19]]
    m = match_result(dt, cells)
    assert m == {0: [0, 2], 1: [1]}


def test_match_result_distance_tiebreak():
    # no overlap with either cell: IoU=0 both, L1 distance decides
    cells = [[0, 0, 10, 0, 10, 10, 0, 10], [100, 0, 110, 0, 110, 10, 100, 10]]
    dt = [[90, 0, 95, 10]]
    m = match_result(dt, cells)
    assert m == {1: [0]}


def test_get_pred_html_single_and_multi():
    tokens = ["<tbody>", "<tr>", "<td>", "</td>", "<td></td>", "</tr>", "</tbody>"]
    matched = {0: [0], 1: [1, 2]}
    ocr = [("alpha", 0.9), ("beta", 0.8), ("gamma", 0.7)]
    html, _ = get_pred_html(tokens, matched, ocr)
    assert html == "<tbody><tr><td>alpha</td><td>beta gamma</td></tr></tbody>"


def test_get_pred_html_bold_stripped_from_content():
    # reference quirk: "<b>" membership is tested on the (text, conf)
    # tuple, so b_with stays False; <b>/</b> are stripped from contents
    tokens = ["<tr>", "<td></td>", "</tr>"]
    matched = {0: [0, 1]}
    ocr = [("<b>head", 0.9), ("er</b>", 0.8)]
    html, _ = get_pred_html(tokens, matched, ocr)
    assert html == "<tr><td>head er</td></tr>"


def test_get_pred_html_bold_exact_tuple_member():
    tokens = ["<tr>", "<td></td>", "</tr>"]
    matched = {0: [0, 1]}
    ocr = [("<b>", 0.9), ("word", 0.8)]
    html, _ = get_pred_html(tokens, matched, ocr)
    # first content "<b>" strips to "" and is skipped; b_with wraps
    assert html == "<tr><td><b>word</b></td></tr>"


def test_filter_ocr_result_drops_above_table():
    cells = np.array([[0, 40, 100, 40, 100, 60, 0, 60]])
    dt = [[0, 10, 50, 20], [0, 45, 50, 55]]
    rec = [("above", 0.9), ("inside", 0.9)]
    nb, nr = filter_ocr_result(cells, dt, rec)
    assert nr == [("inside", 0.9)]


def test_distance_and_iou_scalars():
    assert distance([0, 0, 10, 10], [0, 0, 10, 10]) == 0
    assert compute_iou([0, 0, 10, 10], [0, 0, 10, 10]) == pytest.approx(1.0)
    assert compute_iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0


def test_batched_decode_scatter_back_equals_naive():
    """wh-ratio micro-batched decode must scatter results back to the
    original box order exactly (config.py:387-416 indices mechanism)."""
    import numpy as np

    from paddleocr_spark.kernels.ctc import (
        batched_ctc_decode,
        build_charset,
        ctc_decode,
        wh_ratio_indices,
    )

    charset = build_charset()
    rng = np.random.default_rng(17)
    n = 11
    logits = [rng.random((20, len(charset))).astype(np.float32)
              for _ in range(n)]
    # boxes with varied aspect ratios so the sort actually permutes
    boxes = []
    for i in range(n):
        w, h = float(rng.integers(5, 80)), float(rng.integers(5, 40))
        boxes.append([[0, 0], [w, 0], [w, h], [0, h]])
    order = wh_ratio_indices(boxes)
    assert sorted(map(int, order)) == list(range(n))
    assert any(int(o) != k for k, o in enumerate(order))  # non-identity
    got = batched_ctc_decode(logits, boxes, charset, batch_num=4)
    want = [ctc_decode(lg, charset) for lg in logits]
    assert got == want


def test_encode_text_and_pad_reference_semantics():
    """BaseRecLabelEncode.encode + CTCLabelEncode.__call__
    (label_ops.py:119-166): skip-not-reject OOV chars, None on
    empty/overlong/all-OOV, 0-pad + ACE counts."""
    from paddleocr_spark.kernels.ctc import (
        build_charset,
        encode_pad,
        encode_text,
    )

    cs = build_charset()
    assert encode_text("", cs) is None
    assert encode_text("x" * 26, cs) is None          # > max_text_len
    assert encode_text("éé", cs) is None    # all out-of-dict
    ids = encode_text("aéb", cs)                 # OOV skipped
    assert ids == [cs.index("a"), cs.index("b")]
    assert encode_text("AB", cs, lower=True) == \
        [cs.index("a"), cs.index("b")]
    padded, length, ace = encode_pad("ab", cs, max_text_len=5)
    assert padded == [cs.index("a"), cs.index("b"), 0, 0, 0]
    assert length == 2
    assert ace[0] == 3 and sum(ace) == 5
    assert encode_pad("", cs) is None


def test_east_nms_family():
    """locality_aware_nms.py re-creations: weighted merge, locality
    pass, standard NMS, soft-NMS decay modes."""
    import numpy as np

    from paddleocr_spark.kernels.nms import (
        nms_locality,
        quad_iou,
        soft_nms,
        standard_nms,
        weighted_merge,
    )

    def quad(x, y, w, h, s):
        return np.array([x, y, x + w, y, x + w, y + h, x, y + h, s],
                        float)

    a, b = quad(0, 0, 10, 10, 1.0), quad(0, 0, 10, 10, 3.0)
    assert quad_iou(a, b) == pytest.approx(1.0)
    m = weighted_merge(a.copy(), b)
    assert m[8] == 4.0
    # coords are score-weighted: identical quads stay put
    assert np.allclose(m[:8], a[:8])
    # shifted merge lands 3/4 of the way toward the heavier quad
    c = quad(4, 0, 10, 10, 3.0)
    m2 = weighted_merge(a.copy(), c)
    assert m2[0] == pytest.approx(3.0)

    # locality pass merges CONSECUTIVE overlapping rows, then NMS
    rows = np.stack([quad(0, 0, 10, 4, 1.0), quad(1, 0, 10, 4, 1.0),
                     quad(50, 50, 10, 4, 0.9)])
    out = nms_locality(rows, thres=0.3)
    assert out.shape[0] == 2          # first two merged, third kept
    assert out[:, 8].max() == 2.0     # merged score
    assert nms_locality(np.empty((0, 9))).size == 0

    # standard NMS keeps the higher-score of two near-identical quads
    s = np.stack([quad(0, 0, 10, 10, 0.5), quad(0.5, 0, 10, 10, 0.9),
                  quad(40, 40, 5, 5, 0.8)])
    kept = standard_nms(s, 0.3)
    assert kept.shape[0] == 2 and kept[0, 8] == 0.9

    # soft-NMS: gaussian decay drops the overlapped low scorer below
    # threshold; the far box survives untouched
    soft = soft_nms(s, threshold=0.6, method=2)
    assert soft.shape[0] == 2
    assert sorted(soft[:, 8].round(6)) == [0.8, 0.9]
    # linear mode (method=1) and hard mode (else) also run
    assert soft_nms(s, threshold=0.45, method=1).shape[0] >= 2
    assert soft_nms(s, threshold=0.5, method=0).shape[0] == 2
