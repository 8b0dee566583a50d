"""The Iceberg adapter seam, pinned as a test.

Query planning never lists the filesystem: it reads the store's
manifest TABLE (``functions/udfs.py``: ``write_store_manifest`` /
``manifest_path`` — the self-managed stand-in for an Iceberg
manifest, see BENCH/BASELINE.md "Iceberg probe"). With a real catalog
the one-call swap is ``spark.read.format("iceberg")`` (or
``spark.table``) over the same rows. This test RUNS that swap when
``iceberg-spark-runtime`` is on the classpath and skips cleanly in
this image (probed: no jar ships anywhere on disk and there is no
network to fetch one) — documenting exactly what the production
deployment flips.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _iceberg_on_classpath(spark) -> bool:
    try:
        (spark.sparkContext._jvm.java.lang.Class
         .forName("org.apache.iceberg.spark.SparkCatalog"))
        return True
    except Exception:
        return False


def test_manifest_table_swaps_to_iceberg(spark, tmp_path):
    """When the jar is present: register a hadoop catalog, CTAS the
    parquet manifest into an Iceberg table, and verify the
    format("iceberg") read plans the same rows the parquet manifest
    holds — the exact seam map_media_store's planner consumes."""
    if not _iceberg_on_classpath(spark):
        pytest.skip("no iceberg-spark-runtime jar in this image "
                    "(documented environment limit; the manifest "
                    "parquet table is the stand-in)")

    import __spark_entry__ as entry_mod
    from paddleocr_spark.functions.udfs import manifest_path

    _, media_path = entry_mod.corpus_paths(spark,
                                           "/root/testdata/sf0.001")
    manifest = spark.read.parquet(manifest_path(media_path))

    spark.conf.set("spark.sql.catalog.seam",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.seam.type", "hadoop")
    spark.conf.set("spark.sql.catalog.seam.warehouse",
                   str(tmp_path / "warehouse"))
    manifest.writeTo("seam.db.media_manifest").using("iceberg") \
        .createOrReplace()
    via_iceberg = spark.read.format("iceberg") \
        .load("seam.db.media_manifest")
    assert sorted(map(tuple, via_iceberg.collect())) \
        == sorted(map(tuple, manifest.collect()))
