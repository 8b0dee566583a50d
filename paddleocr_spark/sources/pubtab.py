"""PubTabNet-style JSONL source — re-creation of ``PubTabDataSet``
(``toddleocr/datasets/pubtab.py:9-91``): scan of JSONL rows
``{"filename", "html": {"cells": [...], "structure": {"tokens":
[...]}}}`` with the reference's validity predicate (token count in
[1, max_len], non-empty cells; ``pubtab.py:60-77``) — expressed as a
schema'd ``spark.read.json`` plus Catalyst filters instead of a
per-row try/except resample loop (parse failures become filterable
``_corrupt_record`` rows, not silent resamples).
"""

from __future__ import annotations

__all__ = ["pubtab_schema", "read_pubtab"]


def pubtab_schema():
    """The PubTabNet JSONL read schema (built lazily — a module-level
    StructType constant would import pyspark at module load, and
    exporting the bare function under a CONSTANT_CASE name invited
    ``spark.read.schema(PUBTAB_SCHEMA)`` passing a function object)."""
    from pyspark.sql import types as T

    cell = T.StructType([
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("bbox", T.ArrayType(T.IntegerType())),
    ])
    return T.StructType([
        T.StructField("filename", T.StringType()),
        T.StructField("html", T.StructType([
            T.StructField("cells", T.ArrayType(cell)),
            T.StructField("structure", T.StructType([
                T.StructField("tokens", T.ArrayType(T.StringType())),
            ])),
        ])),
        T.StructField("_corrupt_record", T.StringType()),
    ])


def read_pubtab(spark, path: str, max_structure_len: int = 500):
    """JSONL scan + validity filter. Returns (filename,
    structure_tokens, n_cells) for valid rows."""
    from pyspark.sql import functions as F

    df = (spark.read.schema(pubtab_schema())
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(path))
    valid = (df.where(F.col("_corrupt_record").isNull())
             .where(F.col("html.structure.tokens").isNotNull())
             .where(F.size("html.structure.tokens")
                    .between(1, max_structure_len))
             .where(F.size("html.cells") > 0))
    return valid.select(
        "filename",
        F.col("html.structure.tokens").alias("structure_tokens"),
        F.size("html.cells").cast("int").alias("n_cells"),
    )
