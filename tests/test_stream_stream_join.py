"""Stream-stream interval join (the last major Structured Streaming surface:
two watermarked streams joined on key + event-time range; state on both
sides is bounded by the watermark + interval condition)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
    ]
)

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    m = lambda minutes: BASE + dt.timedelta(minutes=minutes)
    views = [(u, m(t), 100 + i) for i, (u, t) in enumerate([(1, 0), (1, 30), (2, 5), (3, 10)])]
    purchases = [(u, m(t), 200 + i) for i, (u, t) in enumerate([(1, 4), (1, 31), (2, 40), (3, 11)])]

    vdir, pdir = str(tmp_path / "views"), str(tmp_path / "purch")
    spark.createDataFrame(views, SCHEMA).write.parquet(vdir)
    spark.createDataFrame(purchases, SCHEMA).write.parquet(pdir)

    def join(vdf, pdf):
        v = vdf.select("user_id", F.col("ts_us").alias("v_ts"), F.col("event_id").alias("view_id"))
        p = pdf.select(
            F.col("user_id").alias("p_user"), F.col("ts_us").alias("p_ts"), F.col("event_id").alias("purchase_id")
        )
        # purchase within 10 minutes AFTER the view
        return v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 10 MINUTES")),
        ).select("user_id", "view_id", "purchase_id")

    batch = {tuple(r) for r in join(spark.read.parquet(vdir), spark.read.parquet(pdir)).collect()}
    assert batch == {(1, 100, 200), (1, 101, 201), (3, 103, 203)}

    vstream = spark.readStream.schema(SCHEMA).parquet(vdir).withWatermark("ts_us", "20 minutes")
    pstream = spark.readStream.schema(SCHEMA).parquet(pdir).withWatermark("ts_us", "20 minutes")
    q = (
        join(vstream, pstream)
        .writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream = {tuple(r) for r in spark.sql("SELECT * FROM ssj_out").collect()}
    assert stream == batch


def test_stream_stream_left_outer_interval_join(spark, tmp_path):
    """LEFT OUTER stream-stream interval join: unmatched left rows are
    emitted with NULL right columns only after the watermark passes the
    interval's upper bound — AvailableNow drains everything, so the final
    memory-sink content must equal the batch left join."""
    m = lambda minutes: BASE + dt.timedelta(minutes=minutes)
    views = [(u, m(t), 100 + i) for i, (u, t) in enumerate([(1, 0), (2, 5), (3, 10), (4, 15)])]
    purchases = [(u, m(t), 200 + i) for i, (u, t) in enumerate([(1, 4), (3, 11)])]

    vdir, pdir = str(tmp_path / "views"), str(tmp_path / "purch")
    spark.createDataFrame(views, SCHEMA).write.parquet(vdir)
    spark.createDataFrame(purchases, SCHEMA).write.parquet(pdir)
    # Outer-join NULL rows are emitted only when a LATER batch advances the
    # watermark past the interval's upper bound — an AvailableNow drain of a
    # single batch would end with every unmatched row still in state. The
    # query watermark is the MIN across all watermarked inputs, so the
    # far-future heartbeats (separate micro-batches via maxFilesPerTrigger=1)
    # must arrive on BOTH streams; heartbeat users (>= 90) are excluded from
    # the comparison because their own unmatched rows sit beyond the final
    # watermark by construction.
    for hb_min, hb_id in [(120, 998), (130, 999)]:
        spark.createDataFrame([(99, m(hb_min), hb_id)], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(pdir)
        spark.createDataFrame([(98, m(hb_min), hb_id)], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(vdir)

    def join(vdf, pdf, how):
        v = vdf.select("user_id", F.col("ts_us").alias("v_ts"), F.col("event_id").alias("view_id"))
        p = pdf.select(
            F.col("user_id").alias("p_user"), F.col("ts_us").alias("p_ts"), F.col("event_id").alias("purchase_id")
        )
        return v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 10 MINUTES")),
            how,
        ).select("user_id", "view_id", "purchase_id")

    batch = {
        tuple(r)
        for r in join(spark.read.parquet(vdir), spark.read.parquet(pdir), "left_outer").collect()
        if r.user_id < 90
    }
    assert batch == {(1, 100, 200), (3, 102, 201), (2, 101, None), (4, 103, None)}

    # outer stream-stream joins REQUIRE watermarks on both sides plus a
    # time bound in the condition (state eviction contract)
    vstream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(vdir)
        .withWatermark("ts_us", "20 minutes")
    )
    pstream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(pdir)
        .withWatermark("ts_us", "20 minutes")
    )
    q = (
        join(vstream, pstream, "left_outer")
        .writeStream.format("memory")
        .queryName("ssj_outer_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream = {
        tuple(r)
        for r in spark.sql("SELECT * FROM ssj_outer_out").collect()
        if r.user_id < 90
    }
    assert stream == batch


def test_watermarked_streaming_dedup(spark, tmp_path):
    """Streaming dropDuplicates over a watermarked event-time column: the
    at-least-once file source becomes exactly-once per (user_id, ts_us) key,
    with dedup state evicted past the watermark (bounded memory — the
    100 TB streaming-ingest dedup pattern). Duplicates arrive in a LATER
    file than the originals and must still be suppressed."""
    m = lambda minutes: BASE + dt.timedelta(minutes=minutes)
    first = [(1, m(0), 100), (2, m(1), 101), (3, m(2), 102)]
    # same (user_id, ts_us) keys, different event_id payloads -> dups
    second = [(1, m(0), 900), (2, m(1), 901), (4, m(3), 103)]

    src = tmp_path / "events"
    src.mkdir()
    spark.createDataFrame(first, SCHEMA).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(second, SCHEMA).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts_us", "30 minutes")
        .dropDuplicates(["user_id", "ts_us"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT user_id, event_id FROM dedup_out").collect()
    got = {r.user_id: r.event_id for r in rows}
    assert len(rows) == 4  # one row per distinct key, dups suppressed
    assert got[1] in (100, 900) and got[2] in (101, 901)  # exactly one survivor
    assert got[3] == 102 and got[4] == 103
