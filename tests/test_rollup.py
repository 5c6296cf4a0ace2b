"""Incremental rollup maintenance: streaming micro-batches additively
merged into the multi-grain snapshot must converge to the one-pass batch
rollup of all data."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.streaming.rollup import hierarchical_rollup, rollup_sink


def test_incremental_rollup_converges_to_batch(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events").select("ts", "event_type", "value").limit(3000)
    src = str(tmp_path / "src")
    ev.repartition(3).write.parquet(src)  # 3 files -> 3 micro-batches

    schema = T.StructType(
        [
            T.StructField("ts", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    snap, ckpt = str(tmp_path / "snap"), str(tmp_path / "ckpt")
    rollup_sink(stream, snap, ckpt).awaitTermination()

    key = lambda r: (r.grain_sec, r.bucket_start, r.event_type)
    got = {key(r): (r.n_events, round(r.sum_value, 2)) for r in spark.read.parquet(snap).collect()}
    expected = {
        key(r): (r.n_events, round(r.sum_value, 2))
        for r in hierarchical_rollup(spark.read.parquet(src)).collect()
    }
    assert got == expected
    assert len({g for g, _, _ in got}) == 3  # all three grains materialized

    # idempotence: re-running over the same checkpoint changes nothing
    rollup_sink(stream, snap, ckpt).awaitTermination()
    got2 = {key(r): (r.n_events, round(r.sum_value, 2)) for r in spark.read.parquet(snap).collect()}
    assert got2 == got
