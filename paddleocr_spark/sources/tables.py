"""Loaders for the driver-generated parquet tables and the synthetic
corpus — the Spark stand-ins for the reference's dataset classes
(``SimpleDataSet`` at ``toddleocr/datasets/simple.py:10-93``,
``LMDBDataSet`` at ``toddleocr/datasets/lmdb.py:12-104``): a scan plus
declarative sampling/filtering instead of index arrays and resample
loops. In production these are Iceberg catalog tables
(``spark.table``); parquet here (no Iceberg jars in the image).
"""

from __future__ import annotations

__all__ = ["load_table", "load_documents_sampled", "union_sources"]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_table(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_documents_sampled(spark, sf_dir: str, ratio: float, seed: int = 42):
    """Multi-source sampling: the ``ratio_list`` mechanism of
    SimpleDataSet (``simple.py:39-45``) as a DETERMINISTIC hash filter
    (md5(seed:doc_id) mod 10^6 < ratio*10^6) rather than df.sample —
    same membership on every engine and every partition layout, so the
    DuckDB oracle reproduces the sample exactly, and at 10^12 rows the
    predicate is scan-side and partition-independent."""
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "documents")
    if ratio >= 1.0:
        return df
    from paddleocr_spark.operators.dedup import ratio_keep

    return df.where(
        ratio_keep(F, F.col("doc_id").cast("string"), ratio, seed))


def union_sources(*dfs):
    """Multi-label-file concatenation (``simple.py:39-45``) →
    unionByName."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
