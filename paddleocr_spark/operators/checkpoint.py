"""Partition-granular checkpoint/resume for the extraction job.

North-rule requirement: a failed 10^12-doc run must resume at partition
granularity with per-partition lineage + metrics. The reference's
analogue is epoch-level ``.pth``+``.states`` checkpointing
(``toddleocr/config.py:453-479, 710-734``); at Spark scale the natural
unit is a deterministic hash bucket of doc_id.

Design (Iceberg in production — ``MERGE``/append per partition with
snapshot isolation; plain parquet directories here. Verified round 2:
the image ships NO iceberg-spark-runtime jar anywhere on disk
(``find / -name '*iceberg*'`` → none, no pyiceberg either) and has no
network to fetch one, so ``spark.jars``/``spark.jars.packages`` cannot
load it; the parquet fallback is the only option and the logic is
identical):

- output written under   <out>/spans/bucket=<b>/
- checkpoint rows under  <out>/checkpoint/ with schema
  (run_id, bucket, doc_count, span_count, wall_ms,
   input_snapshot, code_version, completed_at_ms)
- resume = anti-join pending buckets against completed checkpoint rows
  (idempotent: a bucket's spans directory is overwritten atomically by
  dynamic partition overwrite before its checkpoint row is appended, so
  a crash between the two re-processes that bucket only).
"""

from __future__ import annotations

import os
import time

from paddleocr_spark import __version__
from paddleocr_spark.operators.extract import extract_spans

__all__ = ["run_with_checkpoint", "completed_buckets", "read_output"]

CHECKPOINT_SCHEMA = ("run_id string, bucket int, doc_count long, "
                     "span_count long, wall_ms long, input_snapshot string, "
                     "code_version string, completed_at_ms long")


def completed_buckets(spark, out_dir: str, run_id: str) -> set[int]:
    from pyspark.sql import functions as F

    ckpt = os.path.join(out_dir, "checkpoint")
    try:
        df = spark.read.parquet(ckpt)
    except Exception:
        return set()
    rows = (df.where(F.col("run_id") == run_id)
            .select("bucket").distinct().collect())
    return {r.bucket for r in rows}


def run_with_checkpoint(spark, docs_df, media_df, out_dir: str,
                        run_id: str, n_buckets: int = 8,
                        input_snapshot: str = "synthetic",
                        fail_after_buckets: int | None = None,
                        salt_width: int | None = None):
    """Process all not-yet-completed buckets; returns the list of
    buckets processed this invocation. ``fail_after_buckets`` simulates
    a mid-run crash for the resume test. ``salt_width`` overrides the
    salted-ordering bucket width (extract_spans.SALT_WIDTH default);
    0 forces the plain per-doc window."""
    from pyspark.sql import functions as F

    done = completed_buckets(spark, out_dir, run_id)
    todo = [b for b in range(n_buckets) if b not in done]
    spans_dir = os.path.join(out_dir, "spans")
    ckpt_dir = os.path.join(out_dir, "checkpoint")
    bucket_of = F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")

    processed = []
    for i, b in enumerate(todo):
        if fail_after_buckets is not None and i >= fail_after_buckets:
            break
        t0 = time.time()
        docs_b = docs_df.where(bucket_of == b)
        kw = {} if salt_width is None else {"salt_width": salt_width}
        out = extract_spans(docs_b, media_df, **kw) \
            .withColumn("bucket", F.lit(b))
        (out.write.mode("overwrite")
         .parquet(os.path.join(spans_dir, f"bucket={b}")))
        written = spark.read.parquet(os.path.join(spans_dir, f"bucket={b}"))
        stats = written.agg(
            F.countDistinct("doc_id").alias("docs"),
            F.count("*").alias("spans")).collect()[0]
        wall_ms = int((time.time() - t0) * 1000)
        row = [(run_id, b, int(stats.docs), int(stats.spans), wall_ms,
                input_snapshot, __version__, int(time.time() * 1000))]
        (spark.createDataFrame(row, schema=CHECKPOINT_SCHEMA)
         .write.mode("append").parquet(ckpt_dir))
        processed.append(b)
    return processed


def read_output(spark, out_dir: str):
    return spark.read.parquet(os.path.join(out_dir, "spans"))
