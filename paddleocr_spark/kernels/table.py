"""Table-structure decode — re-creation of ``TableLabelDecode``
(``toddleocr/postprocess/table.py:9-111``): greedy argmax over the
structure-token vocabulary until eos, per-<td> cell bbox denormalized
by source width/height, plus the final HTML wrap
(``toddleocr/config.py:770-777``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["TABLE_TOKENS", "TableVocab", "table_decode", "wrap_html"]

# minimal PubTabNet-style structure vocabulary (reference loads
# table_structure_dict_ch.txt; same token families)
TABLE_TOKENS = [
    "<thead>",
    "</thead>",
    "<tbody>",
    "</tbody>",
    "<tr>",
    "</tr>",
    "<td>",
    "</td>",
    "<td",
    ' colspan="2"',
    ' colspan="3"',
    ' rowspan="2"',
    ">",
    "<td></td>",
]

TD_TOKENS = ["<td>", "<td", "<td></td>"]


class TableVocab:
    """['sos'] + tokens + ['eos'] with index maps, as
    ``AttnLabelDecode.add_special_char`` (``rec.py:159-163``) applied by
    ``TableLabelDecode.__init__`` (``table.py:10-27``)."""

    def __init__(self, tokens=None):
        toks = list(tokens if tokens is not None else TABLE_TOKENS)
        self.character = ["sos"] + toks + ["eos"]
        self.dict = {c: i for i, c in enumerate(self.character)}
        self.sos = self.dict["sos"]
        self.eos = self.dict["eos"]


def table_decode(
    structure_probs: np.ndarray,
    loc_preds: np.ndarray,
    shape_list,
    vocab: TableVocab | None = None,
):
    """One table: structure_probs (T, V), loc_preds (T, 8) normalized
    corner coords, shape_list [h, w, ...] -> (tokens list[str],
    cell_bboxes (K, 8) float, mean_score).

    Mirrors ``TableLabelDecode.decode`` (``table.py:43-74``): skip
    sos/eos indices, break at eos for idx > 0, collect a bbox for every
    td token, denormalize x by w and y by h (``_bbox_decode``,
    ``table.py:107-111``).
    """
    v = vocab or TableVocab()
    h, w = float(shape_list[0]), float(shape_list[1])
    idx = structure_probs.argmax(axis=1)
    prob = structure_probs.max(axis=1)
    tokens: list[str] = []
    bboxes: list[np.ndarray] = []
    scores: list[float] = []
    for t in range(len(idx)):
        char_idx = int(idx[t])
        if t > 0 and char_idx == v.eos:
            break
        if char_idx in (v.sos, v.eos):
            continue
        text = v.character[char_idx]
        if text in TD_TOKENS:
            bbox = loc_preds[t].astype(np.float64).copy()
            bbox[0::2] *= w
            bbox[1::2] *= h
            bboxes.append(bbox)
        tokens.append(text)
        scores.append(float(prob[t]))
    cell_bboxes = np.array(bboxes) if bboxes else np.zeros((0, 8))
    mean_score = float(np.mean(scores)) if scores else 0.0
    return tokens, cell_bboxes, mean_score


def wrap_html(body: str) -> str:
    """``config.py:770-777``: final HTML assembly around the merged
    structure+text body."""
    return "<html><body><table>" + body + "</table></body></html>"
