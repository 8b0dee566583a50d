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
  (run_id, bucket, n_buckets, doc_count, span_count, wall_ms,
   input_snapshot, code_version, completed_at_ms) — n_buckets is
   validated on resume: the same run_id can never continue under a
   different partitioning
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

CHECKPOINT_SCHEMA = ("run_id string, bucket int, n_buckets int, "
                     "doc_count long, "
                     "span_count long, wall_ms long, input_snapshot string, "
                     "code_version string, completed_at_ms long")


def completed_buckets(spark, out_dir: str, run_id: str,
                      n_buckets: int | None = None) -> set[int]:
    """Buckets already checkpointed for ``run_id``. When ``n_buckets``
    is given, a checkpoint row recorded under a DIFFERENT bucket count
    raises — resuming the same run_id with a changed partitioning
    would silently skip wrong buckets and drop documents."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    ckpt = os.path.join(out_dir, "checkpoint")
    try:
        df = spark.read.parquet(ckpt)
    except AnalysisException as e:
        # only "nothing checkpointed yet" means a fresh start; any
        # OTHER read error (permissions, corruption) must surface —
        # swallowing it would silently restart a 10^12-doc run
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return set()
        raise
    rows = (df.where(F.col("run_id") == run_id)
            .select("bucket", "n_buckets").distinct().collect())
    if n_buckets is not None:
        seen = {r.n_buckets for r in rows}
        if seen - {n_buckets}:
            raise ValueError(
                f"run_id {run_id!r} was checkpointed with "
                f"n_buckets={sorted(seen)}; refusing to resume with "
                f"n_buckets={n_buckets} (wrong buckets would be "
                f"skipped and documents dropped)")
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

    done = completed_buckets(spark, out_dir, run_id, n_buckets)
    todo = [b for b in range(n_buckets) if b not in done]
    if not todo:
        # fully-resumed run: nothing to do, so don't pay the store
        # decode or the salt-statistic pass below
        return []
    spans_dir = os.path.join(out_dir, "spans")
    ckpt_dir = os.path.join(out_dir, "checkpoint")
    bucket_of = F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")

    # the store decode is the job's dominant cost and is the same for
    # every bucket — decode ONCE and share (was O(n_buckets x decode));
    # likewise resolve the auto-salt statistic once over all docs
    from paddleocr_spark.functions.udfs import (
        decode_media,
        decode_media_store,
    )
    from paddleocr_spark.operators._cache import (
        eager_persist,
        release_persisted,
    )
    from paddleocr_spark.operators.extract import SALT_WIDTH

    if salt_width is None:
        max_spans = docs_df.agg(
            F.max(F.size("spans")).alias("m")).collect()[0]["m"] or 0
        salt_width = SALT_WIDTH if max_spans > SALT_WIDTH else 0
    fragments = eager_persist(
        decode_media_store(spark, media_df) if isinstance(media_df, str)
        else decode_media(media_df))

    processed = []
    try:
        for i, b in enumerate(todo):
            if fail_after_buckets is not None and i >= fail_after_buckets:
                break
            t0 = time.time()
            docs_b = docs_df.where(bucket_of == b)
            out = extract_spans(docs_b, media_df, salt_width=salt_width,
                                fragments_df=fragments)
            (out.write.mode("overwrite")
             .parquet(os.path.join(spans_dir, f"bucket={b}")))
            written = spark.read.parquet(
                os.path.join(spans_dir, f"bucket={b}"))
            stats = written.agg(
                F.countDistinct("doc_id").alias("docs"),
                F.count("*").alias("spans")).collect()[0]
            wall_ms = int((time.time() - t0) * 1000)
            row = [(run_id, b, n_buckets, int(stats.docs), int(stats.spans),
                    wall_ms, input_snapshot, __version__,
                    int(time.time() * 1000))]
            (spark.createDataFrame(row, schema=CHECKPOINT_SCHEMA)
             .write.mode("append").parquet(ckpt_dir))
            processed.append(b)
    finally:
        # a crash mid-bucket must not leave the fragment cache pinned
        # on a long-lived session (the caller retries run_with_checkpoint
        # on the same session to resume)
        release_persisted(spark)
    return processed


def read_output(spark, out_dir: str):
    return spark.read.parquet(os.path.join(out_dir, "spans"))
