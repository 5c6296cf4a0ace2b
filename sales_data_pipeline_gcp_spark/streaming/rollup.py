"""Hypertable-style hierarchical time rollups (the TimescaleDB
continuous-aggregate shape, re-expressed Spark-first).

Two pieces:

- ``hierarchical_rollup``: ONE pass over raw events producing every grain
  (5 min / 1 h / 1 d) via a posexplode over grain lengths — the Expand
  costs |grains| rows per event but avoids re-scanning raw data per grain,
  and partial aggregation collapses everything map-side. This is the
  batch/backfill path and is fully oracled (``q_rollup_hierarchy``).

- ``rollup_sink``: incremental maintenance — each micro-batch's partial
  aggregates MERGE-SUM into the rollup snapshot (additive update, not
  replacement), so the rollup stays correct as events stream in. Counts
  and decimal-exact sums are algebraic, which is what makes the merge a
  pure addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from sales_data_pipeline_gcp_spark.io import NS_PER_SECOND

GRAINS_SEC = (300, 3600, 86400)


def hierarchical_rollup(ev: DataFrame, grains: tuple[int, ...] = GRAINS_SEC) -> DataFrame:
    """events(ts int64-ns, event_type, value) -> (grain_sec, bucket_start,
    event_type, n_events, sum_value) for every grain, one pass."""
    epoch_sec = F.expr(f"ts div {NS_PER_SECOND}")
    grain = F.posexplode(F.array(*[F.lit(g) for g in grains])).alias("g_idx", "grain_sec")
    exploded = ev.select(epoch_sec.alias("sec"), "event_type", "value").select(
        "sec", "event_type", "value", grain
    )
    bucket = (F.col("sec") - F.pmod(F.col("sec"), F.col("grain_sec"))).alias("bucket_start")
    return (
        exploded.groupBy("grain_sec", bucket, "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,2)")).cast("double").alias("sum_value"),
        )
    )


def rollup_sink(
    stream: DataFrame, snapshot_dir: str, checkpoint_dir: str, grains: tuple[int, ...] = GRAINS_SEC
) -> StreamingQuery:
    """Incrementally maintain the rollup: per micro-batch partials are
    ADDED into the snapshot (sum+sum, count+count) keyed by
    (grain, bucket, event_type)."""
    spark = stream.sparkSession
    keys = ["grain_sec", "bucket_start", "event_type"]

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        import os
        import shutil

        partial = hierarchical_rollup(batch, grains)
        try:
            current = spark.read.parquet(snapshot_dir)
            merged = (
                current.unionByName(partial)
                .groupBy(*keys)
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum(F.col("sum_value").cast("decimal(38,2)")).cast("double").alias("sum_value"),
                )
            )
        except Exception:
            merged = partial
        staging = snapshot_dir + f".staging-{epoch_id}"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.isdir(snapshot_dir):
            shutil.rmtree(snapshot_dir)
        os.rename(staging, snapshot_dir)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
