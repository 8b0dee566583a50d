"""TableMaster matching — re-creation of the reference's second
table-match algorithm (``toddleocr/postprocess/table_master_match.py``):
a 3-rule cascade assigning OCR boxes to structure cells

    1. center rule   (box center inside cell,            :320-342)
    2. IoU rule      (argmax hull-IoU for leftovers,     :345-374)
    3. distance rule (nearest center for unmatched cells, :377-403)

plus the virtual-cell ``extra_match`` for surplus OCR boxes (:406-418,
row-grouped by ``sort_bbox`` :228-283), span-token merging
(``merge_span_token`` :487-536), empty-bbox token substitution
(``deal_eb_token`` :539-573), text insertion (:576-603) and the
``<thead>`` bold normalization ``deal_bb`` (:606-757).

Geometry notes: the reference's ``cal_iou`` (:116-130) is NOT standard
IoU — the denominator is the area of the convex hull of both boxes'
corners (shapely ``MultiPoint(...).convex_hull``); reproduced here with
the repo's own hull/shoelace kernels. All boxes are axis-aligned xyxy
at this stage.
"""

from __future__ import annotations

import math
import re

import numpy as np

from .geometry import convex_hull, polygon_area

__all__ = ["table_master_match", "deal_bb", "merge_span_token",
           "deal_eb_token", "reduce_repeat_bb", "sort_bbox_rows"]


# ---------------------------------------------------------------------------
# geometry helpers (xyxy axis-aligned)

def _xyxy2xywh(b):
    x1, y1, x2, y2 = b
    return [x1 + (x2 - x1) / 2, y1 + (y2 - y1) / 2, x2 - x1, y2 - y1]


def _hull_iou(a, b) -> float:
    """intersection(a, b) / area(convex_hull(corners(a) ∪ corners(b)))
    for axis-aligned xyxy boxes (cal_iou semantics, :116-130)."""
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    if ix == 0.0 or iy == 0.0:
        return 0.0
    corners = np.array([[a[0], a[1]], [a[2], a[1]], [a[2], a[3]],
                        [a[0], a[3]], [b[0], b[1]], [b[2], b[1]],
                        [b[2], b[3]], [b[0], b[3]]], dtype=np.float64)
    hull_area = polygon_area(convex_hull(corners))
    if hull_area == 0:
        return 0.0
    return float(ix * iy) / hull_area


# ---------------------------------------------------------------------------
# the 3-rule cascade

def _cascade_match(e2e_xyxy: np.ndarray, cells_xyxy: np.ndarray):
    """→ match pairs [ocr_idx, cell_idx] via center → IoU → distance,
    then extra virtual-cell pairs for surplus OCR boxes. Returns
    (match_list, extra_list, row_groups)."""
    n_e2e = len(e2e_xyxy)
    n_cells = len(cells_xyxy)
    e2e_xywh = [_xyxy2xywh(b) for b in e2e_xyxy]
    match: list[list[int]] = []

    # rule 1: center containment (every hit, possibly many per box)
    for i, (cx, cy, _, _) in enumerate(e2e_xywh):
        for j, (x1, y1, x2, y2) in enumerate(cells_xyxy):
            if x1 <= cx <= x2 and y1 <= cy <= y2:
                match.append([i, j])

    # rule 2: best hull-IoU for boxes rule 1 left unmatched (strict >0)
    unmatched = [i for i in range(n_e2e)
                 if i not in {m[0] for m in match}]
    for i in unmatched:
        best_iou, best_j = 0.0, None
        for j in range(n_cells):
            iou = _hull_iou(e2e_xyxy[i], cells_xyxy[j])
            if iou > best_iou:
                best_iou, best_j = iou, j
        if best_j is not None:
            match.append([i, best_j])

    # rule 3: for each still-unmatched CELL, nearest unmatched box
    # center (master-outer / end2end-inner min scan, :377-403)
    un_e2e = [i for i in range(n_e2e) if i not in {m[0] for m in match}]
    un_cells = [j for j in range(n_cells) if j not in {m[1] for m in match}]
    if un_e2e and un_cells:
        for j in un_cells:
            mx, my = _xyxy2xywh(cells_xyxy[j])[:2]
            best_d, best_i = math.inf, 0
            for i in un_e2e:
                cx, cy = e2e_xywh[i][:2]
                d = math.hypot(mx - cx, my - cy)
                if d < best_d:
                    best_d, best_i = d, i
            match.append([best_i, j])

    # extra: surplus OCR boxes → virtual cells n_cells.. in row order
    left = [i for i in range(n_e2e) if i not in {m[0] for m in match}]
    extra: list[list[int]] = []
    row_groups: list[list[int]] = []
    if left:
        order, row_groups = sort_bbox_rows([e2e_xywh[i] for i in left], left)
        extra = [[idx, n_cells + k] for k, idx in enumerate(order)]
    return match, extra, row_groups


def sort_bbox_rows(xywh_list, indexes):
    """Group boxes into rows (|Δy| < 3 vs the row's first box,
    :228-283), sort each row by x, rows by first-box y. Returns
    (flattened index order, row index groups)."""
    groups: list[list[int]] = []
    boxes: list[list] = []
    for idx, bb in zip(indexes, xywh_list):
        placed = False
        for g, bg in zip(groups, boxes):
            if abs(bb[1] - bg[0][1]) < 3:
                g.append(idx)
                bg.append(bb)
                placed = True
                break
        if not placed:
            groups.append([idx])
            boxes.append([bb])
    rows = sorted(zip(groups, boxes), key=lambda t: t[1][0][1])
    out_groups: list[list[int]] = []
    flat: list[int] = []
    for g, bg in rows:
        pairs = sorted(zip(g, bg), key=lambda t: t[1][0])
        out_groups.append([p[0] for p in pairs])
        flat.extend(p[0] for p in pairs)
    return flat, out_groups


# ---------------------------------------------------------------------------
# token surgery

def merge_span_token(tokens: list[str]) -> list[str]:
    """Fuse '<td' + span attr(s) + '>' (+implicit '</td>') runs into a
    single token (:487-536); guarantees a trailing '</tbody>'."""
    toks = list(tokens)
    if not toks or toks[-1] != "</tbody>":
        toks.append("</tbody>")
    out: list[str] = []
    p = 0
    while toks[p] != "</tbody>":
        if toks[p] == "<td" and p + 1 < len(toks):
            nxt = toks[p + 1]
            nxt2 = toks[p + 2] if p + 2 < len(toks) else ""
            if nxt.startswith(" colspan=") or nxt.startswith(" rowspan="):
                out.append("".join(toks[p:p + 4]))
                p += 4
                continue
            if nxt2.startswith(" colspan=") or nxt2.startswith(" rowspan="):
                out.append("".join(toks[p:p + 5]))
                p += 5
                continue
        out.append(toks[p])
        p += 1
    out.append("</tbody>")
    return out


_EB_SUBS = [
    ("<eb></eb>", "<td></td>"),
    ("<eb1></eb1>", "<td> </td>"),
    ("<eb2></eb2>", "<td><b> </b></td>"),
    ("<eb3></eb3>", "<td>  </td>"),
    ("<eb4></eb4>", "<td><sup> </sup></td>"),
    ("<eb5></eb5>", "<td><b></b></td>"),
    ("<eb6></eb6>", "<td><i> </i></td>"),
    ("<eb7></eb7>", "<td><b><i></i></b></td>"),
    ("<eb8></eb8>", "<td><b><i> </i></b></td>"),
    ("<eb9></eb9>", "<td><i></i></td>"),
    ("<eb10></eb10>", "<td><b>     </b></td>"),
]


def deal_eb_token(token: str) -> str:
    """Empty-bbox token substitution (:539-573)."""
    for a, b in _EB_SUBS:
        token = token.replace(a, b)
    return token


def reduce_repeat_bb(texts: list[str], break_token: str) -> list[str]:
    """['<b>a</b>', '<b>b</b>'] → ['<b>a b</b>'] when EVERY piece is
    bold (:453-472)."""
    if texts and all(t.startswith("<b>") for t in texts):
        inner = [t.replace("<b>", "").replace("</b>", "") for t in texts]
        return ["<b>" + break_token.join(inner) + "</b>"]
    return texts


def _insert_text(tokens: list[str], cell_texts: dict[int, str]) -> str:
    """Insert matched text into the td stream (:576-603): the k-th td
    token takes cell_texts[k]; missing keys skip the token entirely
    (the reference 'continue's without emitting it)."""
    merged = merge_span_token(tokens)
    out: list[str] = []
    td_count = 0
    for tok in merged:
        if tok.startswith("<td"):
            if td_count > len(cell_texts) - 1 or td_count not in cell_texts:
                td_count += 1
                continue
            tok = tok.replace("><", f">{cell_texts[td_count]}<")
            td_count += 1
        out.append(deal_eb_token(tok))
    return "".join(out)


# --- deal_bb: thead <b> normalization (:606-757) ---

_THEAD_RE = re.compile(r"<thead>(.*?)</thead>")
_SPAN_TD_RE = re.compile(
    r'<td rowspan="\d+" colspan="\d+">|<td colspan="\d+" rowspan="\d+">|'
    r'<td rowspan="\d+">|<td colspan="\d+">')
_TD_CONTENT_RE = re.compile(
    r'<td rowspan="\d+" colspan="\d+">.+?</td>|'
    r'<td colspan="\d+" rowspan="\d+">.+?</td>|'
    r'<td rowspan="\d+">.+?</td>|<td colspan="\d+">.+?</td>|<td>.*?</td>')
_ISOLATE_RE = re.compile(
    r'<td></td> rowspan="\d+" colspan="\d+"></b></td>|'
    r'<td></td> colspan="\d+" rowspan="\d+"></b></td>|'
    r'<td></td> rowspan="\d+"></b></td>|<td></td> colspan="\d+"></b></td>')
_SPAN_ATTR_RE = re.compile(
    r' rowspan="\d+" colspan="\d+"| colspan="\d+" rowspan="\d+"|'
    r' rowspan="\d+"| colspan="\d+"')


def _dedup_bold_in_td(thead: str) -> str:
    for td in _TD_CONTENT_RE.findall(thead):
        if td.count("<b>") > 1 or td.count("</b>") > 1:
            new = td.replace("<b>", "").replace("</b>", "")
            new = new.replace("<td>", "<td><b>").replace("</td>", "</b></td>")
            thead = thead.replace(td, new)
    return thead


def _fix_isolate_span(thead: str) -> str:
    for bad in _ISOLATE_RE.findall(thead):
        attr = _SPAN_ATTR_RE.search(bad)
        if attr is not None:
            thead = thead.replace(bad, f"<td{attr.group()}></td>")
    return thead


def deal_bb(html: str) -> str:
    """Bold every thead cell, handling span attributes, duplicated and
    isolated <b> tokens (:606-757)."""
    m = _THEAD_RE.search(html)
    if m is None:
        return html
    thead = m.group()
    original = thead
    spans = _SPAN_TD_RE.findall(thead)
    if not spans:
        thead = (thead.replace("<td>", "<td><b>")
                 .replace("</td>", "</b></td>")
                 .replace("<b><b>", "<b>")
                 .replace("</b></b>", "</b>"))
    else:
        for sp in spans:
            thead = thead.replace(sp, sp.replace(">", "><b>"))
        thead = thead.replace("</td>", "</b></td>")
        thead = re.sub(r"(<b>)+", "<b>", thead)
        thead = re.sub(r"(</b>)+", "</b>", thead)
        thead = thead.replace("<td>", "<td><b>").replace("<b><b>", "<b>")
    thead = thead.replace("<td><b></b></td>", "<td></td>")
    thead = _dedup_bold_in_td(thead)
    thead = _fix_isolate_span(thead)
    return html.replace(original, thead)


# ---------------------------------------------------------------------------
# the full matcher

def table_master_match(tokens: list[str], cells_xyxy, dt_boxes_xyxy,
                       rec_texts, break_token: str = " ") -> str:
    """structure tokens + cell boxes + OCR (boxes, texts) → merged
    HTML body with deal_bb applied (TableMasterMatcher.__call__ +
    Matcher.match/get_merge_result, :774-994).

    The reference's virtual-token insertion is a deliberate no-op when
    the token stream is complete (ends in '</tbody>'; ':933' extends a
    temporary copy) — surplus OCR boxes then map to virtual cell
    indexes with no td token and are dropped; replicated here by simply
    not emitting virtual tokens for complete streams."""
    cells = np.asarray(cells_xyxy, dtype=np.float64).reshape(-1, 4)
    # drop all-zero cells as remove_empty_bboxes does (:34-47)
    cells = cells[cells.sum(axis=1) != 0.0]
    boxes = np.asarray(dt_boxes_xyxy, dtype=np.float64).reshape(-1, 4)
    match, extra, row_groups = _cascade_match(boxes, cells)

    toks = list(tokens)
    complete = bool(toks) and toks[-1] == "</tbody>"
    if not complete:
        # truncated stream (cut by max length): close a dangling row,
        # add one virtual row per surplus-box row group, close tbody
        if toks and toks[-1] == "<td></td>":
            toks.append("</tr>")
        for group in row_groups:
            toks.append("<tr>")
            toks.extend(["<td></td>"] * len(group))
            toks.append("</tr>")
        toks.append("</tbody>")

    by_cell: dict[int, list[int]] = {}
    for i, j in match + extra:
        by_cell.setdefault(j, []).append(i)
    cell_texts = {
        j: break_token.join(
            reduce_repeat_bb([rec_texts[i] for i in idxs], break_token))
        for j, idxs in by_cell.items()
    }
    return deal_bb(_insert_text(toks, cell_texts))
