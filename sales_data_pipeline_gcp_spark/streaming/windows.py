"""Event-time windowed aggregation over the events stream (SURVEY.md §7
Phase 4). The transforms are written once and used BOTH ways:

- batch: applied to the parquet events table (oracled via epoch-bucket SQL);
- streaming: the same function after ``withWatermark`` — tested for
  batch-equivalence in tests/test_streaming.py.

Window starts are emitted as epoch SECONDS (bigint), not timestamps: the
fixture's raw timestamps are nanosecond-precision, which Spark cannot carry
(µs) while DuckDB can, and instant->wall-clock rendering depends on session
timezone. Epoch integers are exact and timezone-proof (SURVEY.md §7 hard
part #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.functions.exact import exact_sum

TUMBLE_MINUTES = 5
SLIDE_WINDOW_MINUTES = 10
SLIDE_STEP_MINUTES = 5
SESSION_GAP_MINUTES = 30


def tumbling_counts(ev: DataFrame, minutes: int = TUMBLE_MINUTES) -> DataFrame:
    """Tumbling event-time window per event_type: count + exact sum(value).
    ``ev`` needs ``ts_us`` (TimestampType), ``event_type``, ``value``."""
    win = F.window("ts_us", f"{minutes} minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), exact_sum("value", 2).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    ev: DataFrame,
    window_minutes: int = SLIDE_WINDOW_MINUTES,
    step_minutes: int = SLIDE_STEP_MINUTES,
) -> DataFrame:
    """Sliding (hopping) window: each event lands in window/step buckets."""
    win = F.window("ts_us", f"{window_minutes} minutes", f"{step_minutes} minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n_events",
        )
    )


def session_windows(ev: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Session windows per user: events closer than ``gap`` merge into one
    session. Uses Spark's native session_window (works in batch AND
    streaming with watermark; the DuckDB oracle is the classic
    gaps-and-islands lag/cumsum formulation)."""
    win = F.session_window("ts_us", f"{gap_minutes} minutes")
    return (
        ev.groupBy(win.alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), exact_sum("value", 2).alias("sum_value"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
