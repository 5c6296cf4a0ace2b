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

  ``foreachBatch`` is AT-LEAST-ONCE: after a failure between snapshot swap
  and checkpoint commit, Spark replays the last micro-batch, and a naive
  additive merge would double-count it. The sink is made effectively
  exactly-once by recording applied epoch ids INSIDE the snapshot
  generation (``_applied_epochs.json`` — underscore-prefixed files are
  invisible to the parquet reader), so the epoch record and the data swap
  in the same ``os.rename``; a replayed epoch is detected and skipped. The
  swap itself is generation-based (rename current -> .old, staging ->
  current, drop .old) with crash recovery on entry — no rmtree window
  where the only copy of the snapshot is gone.
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
    (grain, bucket, event_type). Replay-safe: see module docstring."""
    spark = stream.sparkSession
    keys = ["grain_sec", "bucket_start", "event_type"]
    old_dir = snapshot_dir + ".old"
    # epoch ids are scoped to a checkpoint lineage; normalize the path so
    # relative/trailing-slash spellings of the same checkpoint don't defeat
    # replay detection and re-apply an epoch
    import os as _os

    checkpoint_dir = _os.path.abspath(checkpoint_dir)

    def _applied_epochs(path: str) -> set[int]:
        # epoch ids are unique only within one checkpoint lineage, so the
        # marker is keyed by checkpoint dir: a NEW stream (fresh checkpoint
        # path) merging into an existing snapshot starts a fresh epoch set
        import json
        import os

        marker = os.path.join(path, "_applied_epochs.json")
        if os.path.isfile(marker):
            with open(marker) as f:
                return set(json.load(f).get(checkpoint_dir, []))
        return set()

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        import glob
        import json
        import os
        import shutil

        # crash recovery: died after current -> .old but before staging ->
        # current; the previous generation is still intact — restore it
        if not os.path.isdir(snapshot_dir) and os.path.isdir(old_dir):
            os.rename(old_dir, snapshot_dir)
        # a crash between staging write and swap leaves .staging-{epoch}
        # dirs behind; they are never the live generation, so always safe
        # to drop (prevents unbounded orphan accumulation across failures)
        for stale in glob.glob(snapshot_dir + ".staging-*"):
            shutil.rmtree(stale, ignore_errors=True)

        applied = _applied_epochs(snapshot_dir) if os.path.isdir(snapshot_dir) else set()
        if epoch_id in applied:
            return  # at-least-once replay of a committed epoch: no-op

        partial = hierarchical_rollup(batch, grains)
        if os.path.isdir(snapshot_dir):
            current = spark.read.parquet(snapshot_dir)
            merged = (
                current.unionByName(partial)
                .groupBy(*keys)
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum(F.col("sum_value").cast("decimal(38,2)")).cast("double").alias("sum_value"),
                )
            )
        else:
            merged = partial
        staging = snapshot_dir + f".staging-{epoch_id}"
        merged.write.mode("overwrite").parquet(staging)
        # the epoch record travels INSIDE the generation being swapped in,
        # so data + idempotence marker commit in one rename
        prior = {}
        prior_marker = os.path.join(snapshot_dir, "_applied_epochs.json")
        if os.path.isfile(prior_marker):
            with open(prior_marker) as f:
                prior = json.load(f)
        prior[checkpoint_dir] = sorted(applied | {epoch_id})
        with open(os.path.join(staging, "_applied_epochs.json"), "w") as f:
            json.dump(prior, f)
        shutil.rmtree(old_dir, ignore_errors=True)
        if os.path.isdir(snapshot_dir):
            os.rename(snapshot_dir, old_dir)
        os.rename(staging, snapshot_dir)
        shutil.rmtree(old_dir, ignore_errors=True)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
