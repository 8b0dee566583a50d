"""TableMaster matching cascade — rule-by-rule unit coverage
(reference: toddleocr/postprocess/table_master_match.py)."""

import numpy as np

from paddleocr_spark.kernels.master_match import (
    deal_bb,
    deal_eb_token,
    merge_span_token,
    reduce_repeat_bb,
    sort_bbox_rows,
    table_master_match,
)

# 2x2 cell grid, complete token stream
CELLS = [[0, 0, 50, 20], [50, 0, 100, 20], [0, 20, 50, 40], [50, 20, 100, 40]]
TOKENS = ["<thead>", "<tr>", "<td></td>", "<td></td>", "</tr>", "</thead>",
          "<tbody>", "<tr>", "<td></td>", "<td></td>", "</tr>", "</tbody>"]


def test_center_rule_places_text():
    boxes = [[5, 5, 45, 15], [55, 5, 95, 15], [5, 25, 45, 35],
             [55, 25, 95, 35]]
    html = table_master_match(TOKENS, CELLS, boxes, ["aa", "bb", "cc", "dd"])
    assert "<td><b>aa</b></td>" in html          # thead cells -> bolded
    assert "<td><b>bb</b></td>" in html
    assert "<td>cc</td>" in html                 # tbody cells
    assert "<td>dd</td>" in html


def test_unmatched_td_tokens_dropped_reference_quirk():
    """Reference quirk (insert_text_to_token :592-596): a td whose
    ordinal exceeds len(match_dict)-1 or has no match is SKIPPED
    entirely (its token never emitted), not kept empty."""
    boxes = [[5, 5, 45, 15], [55, 25, 95, 35]]  # cells 0 and 3 only
    html = table_master_match(TOKENS, CELLS, boxes, ["aa", "bb"])
    assert "<td><b>aa</b></td>" in html
    # cells 1,2 unmatched -> dropped; cell 3's ordinal 3 > len-1 -> its
    # text is dropped too
    assert "bb" not in html
    # exactly one td survives ("<td>" also matches the "<td><b>" prefix)
    assert html.count("<td") == 1


def test_iou_rule_catches_center_outside():
    # center (50,-2) outside every cell, but box overlaps cell 1 most
    boxes = [[40, -14, 60, 10]]
    html = table_master_match(TOKENS, CELLS, boxes, ["xx"])
    # hull-IoU with cell 0 vs cell 1: overlap area equal (10x10), hull
    # of (box ∪ cell1) smaller? cell0=[0,0,50,20] hull spans x 0..60;
    # cell1 spans x 40..100 — symmetric, first max wins -> cell 0
    assert "<td><b>xx</b></td>" in html


def test_distance_rule_fills_unmatched_cell():
    # one box in cell 0; no box near cell 3 — distance rule reuses the
    # nearest unmatched box only when BOTH sides have leftovers, so
    # give two boxes: one clearly in cell 0, one floating far right
    boxes = [[5, 5, 45, 15], [200, 100, 220, 110]]
    html = table_master_match(TOKENS, CELLS, boxes, ["in0", "far"])
    # the floating box has center outside all cells and zero IoU; the
    # three unmatched cells each pick it via min distance
    assert "<td><b>in0</b></td>" in html
    assert html.count("far") == 3


def test_multiple_boxes_one_cell_joined_with_space():
    boxes = [[2, 2, 20, 18], [25, 2, 45, 18]]
    html = table_master_match(TOKENS, CELLS, boxes, ["left", "right"])
    assert "<b>left right</b>" in html


def test_surplus_boxes_dropped_when_stream_complete():
    boxes = [[5, 5, 45, 15], [55, 5, 95, 15], [5, 25, 45, 35],
             [55, 25, 95, 35], [5, 60, 45, 70]]  # 5th below the table
    html = table_master_match(TOKENS, CELLS, boxes,
                              ["a", "b", "c", "d", "extra"])
    assert "extra" not in html  # virtual cell never gets a td token


def test_surplus_boxes_append_rows_when_truncated():
    toks = ["<thead>", "<tr>", "<td></td>", "<td></td>", "</tr>",
            "</thead>", "<tbody>", "<tr>", "<td></td>"]  # cut stream
    cells = [[0, 0, 50, 20], [50, 0, 100, 20], [0, 20, 50, 40]]
    boxes = [[5, 5, 45, 15], [55, 5, 95, 15], [5, 25, 45, 35],
             [5, 60, 45, 70], [55, 60, 95, 70]]
    html = table_master_match(toks, cells, boxes,
                              ["a", "b", "c", "x1", "x2"])
    assert "<td>x1</td><td>x2</td>" in html  # one appended virtual row
    assert html.endswith("</tbody>")


def test_sort_bbox_rows_orders_rows_then_x():
    xywh = [[80, 10, 10, 5], [20, 11, 10, 5], [30, 40, 10, 5]]
    flat, groups = sort_bbox_rows(xywh, [7, 8, 9])
    assert flat == [8, 7, 9]
    assert groups == [[8, 7], [9]]


def test_merge_span_token_colspan():
    toks = ["<tbody>", "<tr>", "<td", ' colspan="2"', ">", "</td>",
            "</tr>", "</tbody>"]
    merged = merge_span_token(toks)
    assert '<td colspan="2"></td>' in merged
    # double-span: the first branch consumes '<td'+rowspan+colspan+'>'
    # (4 tokens) leaving '</td>' separate — reference quirk (:500-509)
    toks2 = ["<tbody>", "<td", ' rowspan="2"', ' colspan="3"', ">",
             "</td>", "</tbody>"]
    merged2 = merge_span_token(toks2)
    assert '<td rowspan="2" colspan="3">' in merged2
    assert "</td>" in merged2


def test_deal_eb_token():
    assert deal_eb_token("<eb></eb>") == "<td></td>"
    assert deal_eb_token("<eb2></eb2>") == "<td><b> </b></td>"


def test_reduce_repeat_bb():
    assert reduce_repeat_bb(["<b>x</b>", "<b>y</b>"], " ") == ["<b>x y</b>"]
    assert reduce_repeat_bb(["<b>x</b>", "y"], " ") == ["<b>x</b>", "y"]


def test_deal_bb_simple_thead():
    html = "<thead><tr><td>h</td><td></td></tr></thead><tbody></tbody>"
    out = deal_bb(html)
    assert "<td><b>h</b></td>" in out
    assert "<td></td>" in out  # empty cell stays unbolded


def test_deal_bb_span_branch():
    html = ('<thead><tr><td colspan="2">h</td></tr></thead>'
            "<tbody></tbody>")
    out = deal_bb(html)
    assert '<td colspan="2"><b>h</b></td>' in out


def test_deal_bb_no_double_bold():
    html = "<thead><tr><td><b>h</b></td></tr></thead>"
    out = deal_bb(html)
    assert out.count("<b>") == 1 and out.count("</b>") == 1
