"""Custom stateful streaming operator (applyInPandasWithState
sessionization) must produce exactly the batch event_sessions result
once every user's state times out."""

import shutil

from paddleocr_spark.operators.relational import event_sessions
from paddleocr_spark.streaming.stateful import sessionize_stream

SF = "/root/testdata/sf0.001"


def test_stateful_sessionize_equals_batch(spark, tmp_path):
    batch = spark.read.parquet(f"{SF}/events.parquet")

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", events_dir / "part-0.parquet")
    # a far-future flush event for a sentinel user advances the
    # watermark past every real session's timeout
    from pyspark.sql import functions as F

    flush = (batch.limit(1)
             .withColumn("user_id", F.lit(999999))
             .withColumn("ts", F.to_timestamp(F.lit("2099-01-01 00:00:00"))))
    flush.write.mode("overwrite").parquet(str(tmp_path / "flush"))
    shutil.copy(next((tmp_path / "flush").glob("part-*.parquet")),
                events_dir / "part-1.parquet")

    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(events_dir)))
    q = (sessionize_stream(stream)
         .writeStream.outputMode("append").format("memory")
         .queryName("sessions_out")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    q.processAllAvailable()
    q.stop()

    got = {(r.user_id, r.n_sessions, r.n_events)
           for r in spark.sql("SELECT * FROM sessions_out").collect()
           if r.user_id != 999999}
    want = {(r.user_id, r.n_sessions, r.n_events)
            for r in event_sessions(spark, SF).collect()}
    assert got == want
    assert len(want) > 0


def test_out_of_order_event_bridges_provisional_sessions(spark, tmp_path):
    """Batch 1 shows user events at t=0 and t=2000 (gap 2000 > 1800);
    a LATE admissible event at t=300 arrives in batch 2 and fills the
    gap — the batch twin sees ONE session of 3 events, and so must the
    stream (an eager-close design freezes the split at 2)."""
    import pandas as pd
    from pyspark.sql import functions as F

    base = pd.Timestamp("2026-01-01 00:00:00")

    def _pdf(rows):
        return pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": [base + pd.Timedelta(seconds=r[1]) for r in rows],
            "event_type": "x", "value": 1.0,
        })

    events_dir = tmp_path / "ev"
    events_dir.mkdir()
    b1 = spark.createDataFrame(_pdf([(7, 0), (7, 2000)]))
    b2 = spark.createDataFrame(_pdf([(7, 300)]))
    flush = spark.createDataFrame(_pdf([(999999, 10_000_000)]))
    for i, df in enumerate((b1, b2, flush)):
        df.coalesce(1).write.mode("overwrite") \
            .parquet(str(tmp_path / f"w{i}"))
        import shutil as _sh

        _sh.copy(next((tmp_path / f"w{i}").glob("part-*.parquet")),
                 events_dir / f"part-{i}.parquet")

    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(events_dir)))
    q = (sessionize_stream(stream)
         .writeStream.outputMode("append").format("memory")
         .queryName("ooo_sessions")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .start())
    q.processAllAvailable()
    q.stop()
    got = {(r.user_id, r.n_sessions, r.n_events)
           for r in spark.sql("SELECT * FROM ooo_sessions").collect()
           if r.user_id != 999999}
    assert got == {(7, 1, 3)}
