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
