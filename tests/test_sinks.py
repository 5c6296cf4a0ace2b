"""foreachBatch upsert sink: streaming CDC into a keyed snapshot — later
events win, re-runs are idempotent."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from sales_data_pipeline_gcp_spark.streaming.sinks import upsert_sink

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)


def test_upsert_sink_latest_state_and_idempotence(spark, tmp_path):
    src = str(tmp_path / "src")
    snap = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        upsert_sink(stream, snap, ckpt, key="user_id", order_col="seq").awaitTermination()

    spark.createDataFrame([(1, 1, "new"), (2, 1, "new"), (1, 2, "active")], SCHEMA).write.mode(
        "append"
    ).parquet(src)
    run()
    got = {r.user_id: (r.seq, r.status) for r in spark.read.parquet(snap).collect()}
    assert got == {1: (2, "active"), 2: (1, "new")}

    # re-run with no new input: exactly-once, snapshot unchanged
    run()
    assert {r.user_id: (r.seq, r.status) for r in spark.read.parquet(snap).collect()} == got

    # CDC batch 2: update user 2, insert user 3
    spark.createDataFrame([(2, 5, "churned"), (3, 1, "new")], SCHEMA).write.mode("append").parquet(src)
    run()
    got2 = {r.user_id: (r.seq, r.status) for r in spark.read.parquet(snap).collect()}
    assert got2 == {1: (2, "active"), 2: (5, "churned"), 3: (1, "new")}
