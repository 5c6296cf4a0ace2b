"""Relational operator surface (SURVEY.md §2.3): aggregations, joins,
windows, sort/limit, set ops, exact dedup.

The reference implements none of these (SURVEY.md §2.1 negative result) —
this module is the generalization an analytics engine needs over the star
schema. Everything is built-in Catalyst primitives: group-bys get automatic
partial (map-side) aggregation, joins get broadcast/SMJ selection + AQE,
windows get a single shuffle on the partition keys.

Scale notes are on each operator. Test scale verifies correctness; the plan
shapes (checked in tests/test_plans.py) are what survive the 1000-executor
scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.functions.exact import exact_sum, sql_avg, sql_sum
from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@register(
    "q_agg_group",
    oracle=f"""
    SELECT
        l_returnflag,
        l_linestatus,
        {sql_sum('l_quantity', 2)}                                    AS sum_qty,
        {sql_sum('l_extendedprice', 2)}                               AS sum_base_price,
        {sql_sum('l_extendedprice * (1 - l_discount)', 6)}            AS sum_disc_price,
        {sql_sum('(l_extendedprice * (1 - l_discount)) * (1 + l_tax)', 8)} AS sum_charge,
        {sql_avg('l_quantity', 2)}                                    AS avg_qty,
        {sql_avg('l_extendedprice', 2)}                               AS avg_price,
        {sql_avg('l_discount', 2)}                                    AS avg_disc,
        COUNT(*)                                                      AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Flagship: TPC-H-Q1-style pricing summary. Scan -> filter -> 8 aggs "
    "by 2 low-cardinality keys -> sort. Partial agg collapses 600k rows to "
    "~4 groups map-side, so the shuffle moves O(partitions*groups) rows.",
    tags=("agg", "flagship"),
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", 2).alias("sum_qty"),
            exact_sum("l_extendedprice", 2).alias("sum_base_price"),
            exact_sum(disc_price, 6).alias("sum_disc_price"),
            exact_sum(charge, 8).alias("sum_charge"),
            (exact_sum("l_quantity", 2) / F.count("l_quantity")).alias("avg_qty"),
            (exact_sum("l_extendedprice", 2) / F.count("l_extendedprice")).alias("avg_price"),
            (exact_sum("l_discount", 2) / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
