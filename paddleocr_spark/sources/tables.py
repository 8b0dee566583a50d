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
    SimpleDataSet (``simple.py:39-45``) is ``df.sample`` — deterministic
    under a fixed seed, executed scan-side."""
    df = load_table(spark, sf_dir, "documents")
    return df if ratio >= 1.0 else df.sample(fraction=ratio, seed=seed)


def union_sources(*dfs):
    """Multi-label-file concatenation (``simple.py:39-45``) →
    unionByName."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
