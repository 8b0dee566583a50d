"""Deterministic SR-pair fixture store + the oracle-checked query for
the ``LMDBDataSetSR`` source (``toddleocr/datasets/lmdb.py:107-160``,
realized by ``sources/lmdb_sr.py``).

Same pattern as ``page_store``/``av_store``/``label_store``: a tiny
parquet table of (idx, image_hr, image_lr, label) rows whose expected
post-source results are analytic. The fixture hits every branch of
``read_sr_pairs``: a raw label over max_len (dropped — the reference's
INTENDED too-long resample, ``lmdb.py:131-133``), labels that project
to empty under the vocabulary (dropped), the "lower" voc_type's
lower-first rule, punctuation/case stripping, and digits-only
pass-throughs. The oracle is a pure VALUES table whose labels come
from a restated one-line Python twin of ``str_filt`` (``re.sub`` over
the same ASCII class) — Spark's ``regexp_replace`` never runs on the
oracle side.
"""

from __future__ import annotations

import os
import re

from paddleocr_spark.cachedir import cache_root

__all__ = ["SR_SPEC", "MAX_LEN", "ensure_sr_store", "sr_pairs_filtered",
           "sr_oracle_sql"]

MAX_LEN = 24
_VOC = "lower"

_LABELS = [
    "Hello-World!",        # case + punctuation stripped
    "ABC 123 xyz",         # spaces stripped, digits kept
    "!!! ???",             # projects to empty -> DROP
    "x" * (MAX_LEN + 6),   # raw too long -> DROP
    "42",                  # digits-only pass-through
    "MiXeD-CaSe_07",
    "   ",                 # whitespace-only -> empty -> DROP
    "Qt5; #tag",
]


def _expected_label(raw: str) -> str | None:
    """Python twin of str_filt(voc_type='lower') + read_sr_pairs'
    drop rules (restated, not imported — oracle independence)."""
    if len(raw) > MAX_LEN:
        return None
    out = re.sub(r"[^0-9a-z]", "", raw.lower())
    return out or None


def _img_bytes(i: int, kind: str) -> bytes:
    n = 64 + 8 * i if kind == "hr" else 16 + 2 * i
    return bytes((j * (i + 2) + (0 if kind == "hr" else 1)) % 256
                 for j in range(n))


# one row per SURVIVING idx: (idx, filtered label, hr bytes, lr bytes)
SR_SPEC = [
    (i, lab, len(_img_bytes(i, "hr")), len(_img_bytes(i, "lr")))
    for i, raw in enumerate(_LABELS)
    if (lab := _expected_label(raw)) is not None
]


def ensure_sr_store(root: str) -> str:
    store = os.path.join(root, "srstore_v1")
    marker = os.path.join(store, "_DONE")
    if os.path.exists(marker):
        return store
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(store, exist_ok=True)
    table = pa.table({
        "idx": pa.array(range(len(_LABELS)), pa.int64()),
        "image_hr": pa.array([_img_bytes(i, "hr")
                              for i in range(len(_LABELS))], pa.binary()),
        "image_lr": pa.array([_img_bytes(i, "lr")
                              for i in range(len(_LABELS))], pa.binary()),
        "label": pa.array(_LABELS, pa.string()),
    })
    pq.write_table(table, os.path.join(store, "pairs.parquet"))
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return store


def sr_pairs_filtered(spark, sf_dir: str):
    """CORRECTNESS query for the SR source: paired scan + str_filt
    vocab projection + the two drop rules, reporting the filtered
    label and the paired payload sizes (the binary columns themselves
    stay opaque, as in the real pipeline)."""
    from pyspark.sql import functions as F

    from paddleocr_spark.sources.lmdb_sr import read_sr_pairs

    store = ensure_sr_store(cache_root())
    df = read_sr_pairs(spark, os.path.join(store, "pairs.parquet"),
                       voc_type=_VOC, max_len=MAX_LEN)
    return (df.select(
                F.col("idx").cast("long").alias("idx"),
                "label",
                F.length("image_hr").cast("long").alias("hr_bytes"),
                F.length("image_lr").cast("long").alias("lr_bytes"))
            .orderBy("idx"))


def sr_oracle_sql() -> str:
    rows = ",\n  ".join(
        f"(CAST({i} AS BIGINT), '{lab}', CAST({hb} AS BIGINT), "
        f"CAST({lb} AS BIGINT))"
        for i, lab, hb, lb in SR_SPEC)
    return ("SELECT * FROM (VALUES\n  " + rows +
            ") AS t(idx, label, hr_bytes, lr_bytes)")
