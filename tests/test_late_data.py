"""Watermark semantics (SURVEY.md §7 Phase 4): in append mode a window only
emits once the watermark passes its end, and events arriving later than
the watermark allows are dropped — state does not grow forever.

The test drives a checkpointed append-mode tumbling aggregation through
three AvailableNow runs: on-time data, then a straggler batch whose events
are both (a) within and (b) beyond the allowed lateness.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src).withWatermark("ts_us", "10 minutes")
    agg = (
        stream.groupBy(F.window("ts_us", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket"), "event_type", "n")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_append_mode_drops_data_later_than_watermark(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")

    m = lambda minutes: BASE + dt.timedelta(minutes=minutes)
    # run 1: events at 12:01 and 12:03 (bucket 12:00) and 12:52 (advances
    # the watermark to 12:42 -> bucket 12:00 is finalized and emitted)
    _write_batch(spark, src, [(m(1), "view", 1.0), (m(3), "view", 1.0), (m(52), "view", 1.0)])
    _run(spark, src, out, ckpt)
    first = {(r.bucket, r.n) for r in spark.read.parquet(out).collect()}
    assert (BASE, 2) in first, first  # 12:00 bucket emitted with both events

    # run 2: a straggler at 12:02 — EARLIER than the 12:42 watermark ->
    # must be dropped (its bucket already finalized), plus an event at
    # 12:40 (>= watermark-allowed) -> must be accepted into a live bucket,
    # and one at 13:30 to push the watermark far past everything
    _write_batch(spark, src, [(m(2), "view", 1.0), (m(40), "view", 1.0), (m(90), "view", 1.0)])
    _run(spark, src, out, ckpt)

    final = {}
    for r in spark.read.parquet(out).collect():
        final[r.bucket] = final.get(r.bucket, 0) + r.n
    # the 12:00 bucket must NOT have grown (straggler dropped)
    assert final[BASE] == 2, final
    # the 12:40 bucket made it
    assert final.get(m(40)) == 1, final
