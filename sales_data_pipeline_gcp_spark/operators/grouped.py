"""Grouped-map Pandas UDF surface (SURVEY.md §2.5): ``applyInPandas`` for
per-group model fitting that built-in aggregates can't express directly.

Demo operator: per-customer spend trend — ordinary-least-squares slope of
order totals (in cents) over order date (in days). The UDF works in exact
integer sums (numpy int64), so the closed-form slope

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)

is computed from identical integers in both engines and the final double
division is bit-identical — which is how a Python-side grouped map can be
held to a SQL oracle.

Scale note: applyInPandas shuffles once on the group key and holds ONE
group per Arrow batch in memory — fine for per-customer groups (tens of
rows); for mega-groups you'd pre-aggregate the five sums with built-ins and
skip Python entirely (that variant is exactly the oracle SQL).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.io import fan_out, load
from sales_data_pipeline_gcp_spark.plans.registry import register

US_PER_DAY = 86_400_000_000

TREND_SCHEMA = "o_custkey bigint, n_orders bigint, slope_cents_per_day double"


def _fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # Called once per GROUP (~15k times per run), so per-call pandas
    # overhead is the operator's dominant Python cost (guide §4.2: make the
    # per-batch body cheap). numpy-only field access — to_numpy + view
    # instead of a Series astype chain, iat instead of iloc — cut the body
    # 860 -> 207 us/group (round 13, bit-identical output: same int64
    # day/cent values, same banker's rounding, same closed-form division).
    import numpy as np

    x = pdf["o_orderdate"].to_numpy(dtype="datetime64[us]").view("int64") // US_PER_DAY
    y = np.round(pdf["o_totalprice"].to_numpy() * 100).astype("int64")
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx = int((x * x).sum())
    denom = n * sxx - sx * sx
    slope = float(n * sxy - sx * sy) / float(denom) if denom != 0 else None
    return pd.DataFrame(
        {"o_custkey": [pdf["o_custkey"].iat[0]], "n_orders": [n], "slope_cents_per_day": [slope]}
    )


def spend_trend(orders: DataFrame) -> DataFrame:
    # explicit repartition on the group key: AQE would coalesce the tiny
    # shuffle to ~5 partitions, serializing the (Python-bound) group
    # processing onto 5 workers — a user-pinned partition count keeps every
    # core's Python worker busy (4x wall-clock here). At cluster scale the
    # same pin prevents one executor from owning the whole Python stage.
    n = orders.sparkSession.sparkContext.defaultParallelism
    # ship ONLY the 3 columns the fit uses across the Python boundary
    # (guide §4.1: Spark cannot see which columns applyInPandas touches,
    # so an un-projected input Arrow-transfers every column of orders)
    pts = orders.select("o_custkey", "o_orderdate", "o_totalprice")
    return pts.repartition(n, "o_custkey").groupBy("o_custkey").applyInPandas(
        _fit_group, schema=TREND_SCHEMA
    )


_TREND_ORACLE = """
    WITH pts AS (
        SELECT o_custkey,
               -- BIGINT day number (the seconds-since-1970 // 86400 form is
               -- DOUBLE on DuckDB 1.0.0 and exact only below 2^53 sums)
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS x,
               CAST(ROUND(o_totalprice * 100) AS BIGINT)    AS y
        FROM orders
    ), sums AS (
        SELECT o_custkey,
               COUNT(*)                 AS n,
               CAST(SUM(x) AS BIGINT)   AS sx,
               CAST(SUM(y) AS BIGINT)   AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM pts GROUP BY o_custkey
    )
    SELECT o_custkey,
           n AS n_orders,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
           END AS slope_cents_per_day
    FROM sums
    """


@register(
    "q_grouped_trend",
    oracle=_TREND_ORACLE,
    doc="Grouped-map Pandas UDF (applyInPandas): per-customer OLS spend "
    "trend in exact integer arithmetic; the oracle is the closed-form SQL "
    "— Python batch path held to declarative semantics bit-for-bit.",
    tags=("udf", "grouped"),
)
def q_grouped_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spend_trend(load(spark, sf_dir, "orders"))


@register(
    "q_grouped_trend_sql",
    oracle=_TREND_ORACLE,
    doc="Declarative twin of q_grouped_trend — the SAME per-customer OLS "
    "slope from built-in integer-exact aggregates (no Python anywhere): "
    "one hash aggregation of five sums, closed-form slope. This is the "
    "100 TB path (~10x the applyInPandas variant — whole-stage codegen, "
    "no Arrow transfer, partial aggregation map-side); the UDF variant "
    "exists to declare the grouped-map surface itself.",
    tags=("grouped", "agg"),
)
def q_grouped_trend_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    # x: day number (orders are midnight-aligned, so datediff == epoch//86400
    # with zero timezone exposure); y: integer cents (exact)
    pts = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast("long").alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    g = pts.groupBy("o_custkey").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    denom = n * sxx - sx * sx
    slope = F.when(denom == 0, F.lit(None).cast("double")).otherwise(
        (n * sxy - sx * sy).cast("double") / denom.cast("double")
    )
    return g.select("o_custkey", n.alias("n_orders"), slope.alias("slope_cents_per_day"))
