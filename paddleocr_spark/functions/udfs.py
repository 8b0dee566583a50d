"""Arrow-batched UDFs for the extraction stages.

The hot path is ``decode_media``: one ``mapInPandas`` stage that runs
det (DB binarize + box post-process, ``toddleocr/postprocess/db.py``),
reading-order sort (``utils/utility.py:170-192``), cls decode
(``postprocess/cls.py``), CTC rec decode (``postprocess/rec.py``) and
table-structure decode + match (``postprocess/table.py``,
``postprocess/matcher.py``) per distinct media item, emitting one row
per output fragment (a UDTF in Spark terms: 1 media row → N fragment
rows, like the reference's one-image→many-boxes det stage).

Doing all stages in ONE Python crossing (instead of det / cls / rec as
separate UDF stages, as a literal port would) halves Arrow serialization
traffic and keeps the fat tensor columns from ever entering a shuffle:
only small string fragments leave this stage.
"""

from __future__ import annotations

__all__ = ["MEDIA_FRAGMENT_SCHEMA", "decode_media"]

MEDIA_FRAGMENT_SCHEMA = (
    "media_ref string, box_idx int, out_kind string, out_text string, "
    "conf double, cls_label string, cls_score double, aux string"
)

_MEDIA_COLS = [
    "media_ref", "layout_scores", "det_map", "det_h", "det_w", "shape_list",
    "rec_logits", "rec_t", "rec_c", "cls_probs",
    "structure_probs", "struct_t", "struct_v", "loc_preds",
]


def _decode_batches(batches):
    # import inside the worker so only executors pay the import
    import pandas as pd

    from paddleocr_spark.extract_core import decode_media_row

    cols = ["media_ref", "box_idx", "out_kind", "out_text", "conf",
            "cls_label", "cls_score", "aux"]
    for pdf in batches:
        out = {c: [] for c in cols}
        for row in pdf.itertuples(index=False):
            d = row._asdict()
            for frag in decode_media_row(d):
                out["media_ref"].append(d["media_ref"])
                out["box_idx"].append(frag["box_idx"])
                out["out_kind"].append(frag["out_kind"])
                out["out_text"].append(frag["out_text"])
                out["conf"].append(frag["conf"])
                out["cls_label"].append(frag["cls_label"])
                out["cls_score"].append(frag["cls_score"])
                out["aux"].append(frag["aux"])
        yield pd.DataFrame(out)


def decode_media(media_df, repartition: int | None = None):
    """media store DataFrame → fragment DataFrame.

    ``repartition`` round-robins the (unkeyed) media rows so decode cost
    spreads evenly across executors regardless of upstream file layout —
    the fixture-world analogue of the reference's DataLoader sharding.
    """
    df = media_df.select(*_MEDIA_COLS)
    if repartition:
        df = df.repartition(repartition)
    return df.mapInPandas(_decode_batches, schema=MEDIA_FRAGMENT_SCHEMA)
