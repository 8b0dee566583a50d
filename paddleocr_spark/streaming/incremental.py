"""Incremental extraction over a growing corpus.

The reference is bounded-batch only (SURVEY.md §2.10); its closest
analogue is the periodic re-run of eval every ``eval_batch_step`` iters
(``toddleocr/config.py:651-663``). On Spark, "new documents keep
arriving" is Structured Streaming: a file-source stream over the docs
table directory, ``foreachBatch`` running the SAME batch extract per
micro-batch (exactly-once via the streaming checkpoint + idempotent
append), so batch and streaming share one implementation.
"""

from __future__ import annotations

from paddleocr_spark.corpus import docs_schema
from paddleocr_spark.operators.extract import extract_spans

__all__ = ["incremental_extract", "windowed_event_counts",
           "streaming_exact_dedup", "streaming_page_ingest",
           "streaming_partitioned_events"]


def incremental_extract(spark, docs_dir: str, media_df, out_dir: str,
                        checkpoint_dir: str):
    """Start a stream: new parquet files under ``docs_dir`` →
    extract_spans → append to ``out_dir``. Returns the StreamingQuery
    (caller drives it; tests use processAllAvailable())."""
    stream = (spark.readStream
              .schema(docs_schema())
              .option("maxFilesPerTrigger", 8)
              .parquet(docs_dir))

    def process(batch_df, epoch_id: int):
        (extract_spans(batch_df, media_df)
         .write.mode("append").parquet(out_dir))

    return (stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def windowed_event_counts(spark, events_stream_df, watermark: str = "1 hour",
                          window: str = "30 minutes"):
    """Watermarked tumbling-window counts — the streaming form of
    relational.event_hourly, tolerant of late data."""
    from pyspark.sql import functions as F

    return (events_stream_df
            # watermarks need TIMESTAMP; parquet yields TIMESTAMP_NTZ
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("sum_value")))


def streaming_exact_dedup(spark, docs_dir: str, watermark: str = "1 hour"):
    """Streaming exact deduplication — the training-data pipeline's
    "never emit the same content twice" guard as NATIVE Structured
    Streaming state: ``dropDuplicatesWithinWatermark`` on the
    normalized-content md5 keeps first-seen rows across micro-batches
    (state-store backed, exactly-once under the streaming checkpoint).

    State eviction: plain ``dropDuplicates([key])`` without the
    event-time column in the subset never evicts — state grows
    unboundedly despite a watermark on the stream.
    ``dropDuplicatesWithinWatermark`` keys state by md5 but expires
    each entry once the watermark passes its event time, so state is
    bounded by the dedup window (duplicates arriving farther apart
    than the watermark may be re-emitted — the documented trade of
    every watermark-bounded streaming dedup).

    Batch twin: ``operators.dedup.exact_dedup`` keepers (min doc_id =
    first in arrival order here, since the synthetic stream arrives in
    doc_id order). Returns the deduped streaming DataFrame."""
    from pyspark.sql import functions as F

    stream = (spark.readStream
              .schema("doc_id long, text string, lang string, "
                      "source string, n_chars long")
              .option("maxFilesPerTrigger", 4)
              .parquet(docs_dir))
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return (stream
            .withColumn("content_md5", F.md5(norm))
            .withColumn("arrival", F.current_timestamp())
            .withWatermark("arrival", watermark)
            .dropDuplicatesWithinWatermark(["content_md5"])
            .select("doc_id", "content_md5"))


def streaming_page_ingest(spark, files_dir: str, out_dir: str,
                          checkpoint_dir: str):
    """Incremental container ingest: new PDF/TIFF/image files landing
    under ``files_dir`` → page explode (corrupt containers quarantined
    as ERROR_PAGE rows, never failing the stream) → append page rows to
    ``out_dir``. The ingest-side half of check_and_read as a stream —
    at production scale this is the feed that keeps the media store
    growing while extraction streams behind it. Same implementation as
    the batch path (explode_pages), exactly-once via the streaming
    checkpoint. Returns the StreamingQuery."""
    from paddleocr_spark.sources.media_files import explode_pages

    stream = (spark.readStream
              .format("binaryFile")
              # streaming sources require an explicit schema; this is
              # binaryFile's fixed one
              .schema("path string, modificationTime timestamp, "
                      "length long, content binary")
              .option("maxFilesPerTrigger", 8)
              .load(files_dir))

    def process(batch_df, epoch_id: int):
        (explode_pages(batch_df, on_error="quarantine")
         .write.mode("append").parquet(out_dir))

    return (stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def streaming_partitioned_events(spark, events_dir: str, out_dir: str,
                                 checkpoint_dir: str):
    """Stream events into the SAME day-partitioned, pruning-ready
    layout that ``operators/partitioning.py`` builds in batch: a native
    parquet sink with ``partitionBy(event_day)``, so the landing table
    is immediately partition-prunable by any day-window query — no
    post-hoc re-layout job. Exactly-once via the streaming checkpoint;
    batch == streaming layout is asserted in the tests. Returns the
    StreamingQuery."""
    from paddleocr_spark.operators.partitioning import epoch_day

    schema = spark.read.parquet(events_dir).schema
    stream = (spark.readStream
              .schema(schema)
              .option("maxFilesPerTrigger", 8)
              .parquet(events_dir)
              .withColumn("event_day", epoch_day()))
    return (stream.writeStream
            .format("parquet")
            .partitionBy("event_day")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
