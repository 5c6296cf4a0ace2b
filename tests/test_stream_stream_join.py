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
