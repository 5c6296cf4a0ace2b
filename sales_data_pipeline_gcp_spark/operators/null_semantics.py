"""NULL-semantics surface: the reference's whole cleaning story is NULL
handling (SURVEY.md §1.2 "NULLs are first-class citizens"), so the engine
declares the 3-valued-logic behaviors explicitly and proves them against
the oracle — aggregate NULL-skipping, NULL group keys, NULL-safe equality,
and conditional aggregation (FILTER clause).

Input NULLs are derived deterministically from lineitem (the fixtures are
NULL-free) with the same pattern both engines compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.plans.registry import register

_NULLED = """
    SELECT CASE WHEN l_linenumber % 4 = 0 THEN NULL ELSE l_returnflag END AS flag,
           CASE WHEN l_orderkey % 3 = 0 THEN NULL ELSE l_quantity END     AS qty,
           l_orderkey, l_linenumber
    FROM lineitem
"""


def _nulled(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        F.when(F.col("l_linenumber") % 4 == 0, F.lit(None)).otherwise(F.col("l_returnflag")).alias("flag"),
        F.when(F.col("l_orderkey") % 3 == 0, F.lit(None)).otherwise(F.col("l_quantity")).alias("qty"),
        "l_orderkey",
        "l_linenumber",
    )


@register(
    "q_null_semantics",
    oracle=f"""
    WITH nulled AS ({_NULLED})
    SELECT flag,
           COUNT(*)                       AS n_rows,
           COUNT(qty)                     AS n_qty,       -- NULLs skipped
           CAST(CAST(SUM(CAST(qty AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) AS sum_qty, -- NULL if all NULL
           COUNT(*) - COUNT(qty)          AS n_null_qty,
           COUNT(DISTINCT qty)            AS n_distinct_qty -- NULL excluded
    FROM nulled
    GROUP BY flag
    """,
    doc="Aggregate NULL semantics: COUNT(*) vs COUNT(col), SUM skipping "
    "NULLs, NULL group key forming its own group, DISTINCT excluding NULL "
    "— grouped by a nullable key so every behavior is observable.",
    tags=("nulls", "agg"),
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _nulled(spark, sf_dir)
    return n.groupBy("flag").agg(
        F.count("*").alias("n_rows"),
        F.count("qty").alias("n_qty"),
        F.sum(F.col("qty").cast("decimal(38,2)")).cast("string").cast("double").alias("sum_qty"),
        (F.count("*") - F.count("qty")).alias("n_null_qty"),
        F.countDistinct("qty").alias("n_distinct_qty"),
    )


@register(
    "q_null_safe_join",
    oracle=f"""
    WITH nulled AS ({_NULLED})
    SELECT a.l_orderkey AS k_a, a.l_linenumber AS ln_a,
           b.l_orderkey AS k_b, b.l_linenumber AS ln_b
    FROM nulled a JOIN nulled b
      ON a.flag IS NOT DISTINCT FROM b.flag
     AND a.l_orderkey = b.l_orderkey
     AND a.l_linenumber + 1 = b.l_linenumber
    """,
    doc="NULL-safe equality join (<=> / IS NOT DISTINCT FROM): NULL flag "
    "rows DO match each other, unlike plain equality — adjacent lines of "
    "the same order with the same (possibly NULL) flag.",
    tags=("nulls", "join"),
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _nulled(spark, sf_dir)
    a = n.alias("a")
    b = n.alias("b")
    return (
        a.join(
            b,
            F.col("a.flag").eqNullSafe(F.col("b.flag"))
            & (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") + 1 == F.col("b.l_linenumber")),
        )
        .select(
            F.col("a.l_orderkey").alias("k_a"),
            F.col("a.l_linenumber").alias("ln_a"),
            F.col("b.l_orderkey").alias("k_b"),
            F.col("b.l_linenumber").alias("ln_b"),
        )
    )


@register(
    "q_agg_filtered",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05)                       AS n_discounted,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2)))
                FILTER (WHERE l_tax = 0.0) AS DOUBLE)                      AS sum_taxfree,
           COUNT(*) FILTER (WHERE l_quantity >= 25 AND l_discount = 0.0)   AS n_bulk_fullprice
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Conditional aggregation via the FILTER clause (SQL surface; the "
    "DataFrame twin is sum(when(...)); one pass, no self-joins).",
    tags=("agg",),
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    dec_price = F.col("l_extendedprice").cast("decimal(38,2)")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.sum(F.when(F.col("l_tax") == 0.0, dec_price)).cast("double").alias("sum_taxfree"),
        F.count(F.when((F.col("l_quantity") >= 25) & (F.col("l_discount") == 0.0), 1)).alias(
            "n_bulk_fullprice"
        ),
    )
