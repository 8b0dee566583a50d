"""Partition-pruned scans — the other half of the storage-layout story
(``operators/bucketing.py`` covers join co-location; this covers
time-range elimination).

A 100 TB event/telemetry table is written partitioned by an epoch-day
column; any query with a day predicate then plans a scan of ONLY the
matching partition directories — Catalyst partition pruning eliminates
the rest at planning time, before a single byte is read. The epoch-day
key (``floor(unix_timestamp(ts)/86400)``) is integer and
timezone-proof, the same oracle-safe idiom as ``event_hourly``.

The plan gate in ``tests/test_plan_quality.py`` asserts the scan node
carries the day bounds as ``PartitionFilters`` (planning-time
elimination), not ordinary data filters, and that the unpartitioned
control scan of the same data cannot prune. ``partitioned_events_agg``
value-checks the result against the raw table.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

__all__ = ["DAY_LO", "DAY_HI", "epoch_day", "ensure_partitioned_events",
           "partitioned_events_agg"]

# the driver's events generator spans epoch days 19723..19752 at every
# sf; this window keeps 10 of the 30 day-partitions (prunes 2/3)
DAY_LO, DAY_HI = 19730, 19739


def epoch_day(col: str = "ts"):
    return F.floor(F.unix_timestamp(col) / 86400).cast("long")


def _cache_root() -> str:
    from paddleocr_spark.cachedir import cache_root

    return cache_root("partitioned")


def ensure_partitioned_events(spark, sf_dir: str) -> str:
    """Write the events table day-partitioned under the repo cache
    (idempotent via a DONE marker; the once-per-ingest layout cost,
    like the bucketed-pair write)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_cache_root(), tag, "events")
    marker = os.path.join(path, "_DONE")
    if os.path.exists(marker):
        return path
    (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
     .withColumn("event_day", epoch_day())
     .write.mode("overwrite").partitionBy("event_day").parquet(path))
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return path


def partitioned_events_agg(spark, sf_dir: str):
    """CORRECTNESS query: day-windowed aggregation over the partitioned
    layout. The window predicate lands in the scan's PartitionFilters
    (plan-gated), so only 10 of 30 day directories are ever read; the
    values are layout-independent (the oracle filters the raw table)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = ensure_partitioned_events(spark, sf_dir)
    ev = spark.read.parquet(path)
    return (ev.where(F.col("event_day").between(DAY_LO, DAY_HI))
            .groupBy("event_day", "event_type")
            .agg(F.count("*").cast("long").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .withColumn("event_day", F.col("event_day").cast("long"))
            .orderBy("event_day", "event_type"))
