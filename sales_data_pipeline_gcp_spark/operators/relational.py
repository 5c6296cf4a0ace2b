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
from sales_data_pipeline_gcp_spark.io import fan_out, load
from sales_data_pipeline_gcp_spark.operators.core import top_k, top_k_per_group
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
        {sql_sum('(l_extendedprice * (1 - l_discount)) * (1 + l_tax)', 6)} AS sum_charge,
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
    # fan_out after the pushdown filter + narrow projection (io.fan_out;
    # guide §2.2): the decimal partial aggregation otherwise serializes on
    # one input split — decimal sums/counts are order-independent
    li = fan_out(
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .select(
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
        )
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", 2).alias("sum_qty"),
            exact_sum("l_extendedprice", 2).alias("sum_base_price"),
            exact_sum(disc_price, 6).alias("sum_disc_price"),
            # scale 6: per-row charge has <= 6 true decimals (2+2+2) so the cast
            # is exact, AND the scaled integer stays under 2^53 so decimal->double
            # is a single correctly-rounded step in BOTH engines (at scale 8 the
            # scaled int exceeds 2^53 and DuckDB's int->double pre-rounding
            # diverges from Spark's BigDecimal conversion by 1 ulp)
            exact_sum(charge, 6).alias("sum_charge"),
            (exact_sum("l_quantity", 2) / F.count("l_quantity")).alias("avg_qty"),
            (exact_sum("l_extendedprice", 2) / F.count("l_extendedprice")).alias("avg_price"),
            (exact_sum("l_discount", 2) / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*)                  AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Distinct aggregation: Spark expands COUNT(DISTINCT) into a "
    "two-phase partial-distinct plan automatically.",
    tags=("agg",),
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "q_agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*)              AS n_items,
           {sql_sum('l_quantity', 2)} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Hierarchical subtotals via ROLLUP (grouping-sets family). Spark "
    "expands to a single Expand+HashAggregate — one pass over the data.",
    tags=("agg",),
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        fan_out(
            load(spark, sf_dir, "lineitem").select(
                "l_returnflag", "l_linestatus", "l_quantity"
            )
        )
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"), exact_sum("l_quantity", 2).alias("sum_qty"))
    )


@register(
    "q_agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*)              AS n_items,
           {sql_sum('l_extendedprice', 2)} AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="Full cross-dimensional subtotals via CUBE.",
    tags=("agg",),
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        fan_out(
            load(spark, sf_dir, "lineitem").select(
                "l_returnflag", "l_linestatus", "l_extendedprice"
            )
        )
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"), exact_sum("l_extendedprice", 2).alias("sum_price"))
    )


@register(
    "q_agg_global",
    oracle=f"""
    SELECT COUNT(*)                     AS n_rows,
           COUNT(DISTINCT l_orderkey)   AS n_orders,
           {sql_sum('l_quantity', 2)}   AS sum_qty,
           MIN(l_extendedprice)         AS min_price,
           MAX(l_extendedprice)         AS max_price,
           {sql_avg('l_discount', 2)}   AS avg_disc
    FROM lineitem
    """,
    doc="Global (keyless) aggregation — partial aggregation reduces each "
    "partition to one row before the single-row final merge.",
    tags=("agg",),
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO fan_out here (round 13): the driver's r12 bench read the round-12
    # repartition 1.38x SLOWER in both its runs (1.10 -> 1.52s) — the
    # count-distinct Expand already provides a shuffle for parallelism and
    # the keyless-repartition sort (guide §2.5) is pure overhead on this
    # cheap-aggregate shape.
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        exact_sum("l_quantity", 2).alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        (exact_sum("l_discount", 2) / F.count("l_discount")).alias("avg_disc"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q_join_inner",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           {sql_sum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Inner equi-join lineitem x orders. No broadcast hint: both sides "
    "are fact-sized at 100 TB, so the right plan is a shuffle join on the "
    "key; AQE picks broadcast automatically when one side is actually small.",
    tags=("join",),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
        )
    )


@register(
    "q_join_outer",
    oracle=f"""
    SELECT c_custkey,
           COALESCE(n_orders, 0)    AS n_orders,
           COALESCE(spend, 0.0)     AS spend
    FROM customer
    LEFT JOIN (
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               {sql_sum('o_totalprice', 2)} AS spend
        FROM orders GROUP BY o_custkey
    ) AS agg ON c_custkey = o_custkey
    """,
    doc="Left outer join: every customer, zero-filled when orderless. "
    "Aggregate-before-join keeps the join input small (one row per custkey) "
    "— the scale-correct shape versus join-then-aggregate.",
    tags=("join",),
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), exact_sum("o_totalprice", 2).alias("spend"))
    )
    return cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("spend", F.lit(0.0)).alias("spend"),
    )


@register(
    "q_join_semi_anti",
    oracle="""
    SELECT 'semi' AS side, c_custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    UNION ALL
    SELECT 'anti' AS side, c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    doc="Left-semi (EXISTS) and left-anti (NOT EXISTS) joins, tagged and "
    "unioned. The filter on orders is applied BEFORE the join so the "
    "build side shrinks first.",
    tags=("join",),
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    semi = cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        F.lit("semi").alias("side"), "c_custkey"
    )
    anti = cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        F.lit("anti").alias("side"), "c_custkey"
    )
    return semi.unionByName(anti)


@register(
    "q_join_range",
    oracle="""
    SELECT p_brand, COUNT(*) AS n
    FROM lineitem JOIN part
      ON l_partkey = p_partkey
     AND l_quantity BETWEEN p_size - 2 AND p_size + 2
    GROUP BY p_brand
    """,
    doc="Equi-join with a residual range predicate — executes as a hash/SMJ "
    "join on the equi key with the range as a post-join filter, NOT an "
    "O(n^2) theta join.",
    tags=("join",),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == part.p_partkey)
        & (li.l_quantity >= part.p_size - 2)
        & (li.l_quantity <= part.p_size + 2)
    )
    return li.join(part, cond, "inner").groupBy("p_brand").agg(F.count("*").alias("n"))


@register(
    "q_join_star",
    oracle=f"""
    SELECT r_name, n_name,
           COUNT(*) AS n_items,
           {sql_sum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN customer ON o_custkey   = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    doc="Multi-way star join (TPC-H Q5 shape). nation/region are broadcast "
    "explicitly (tiny dims, always); customer/orders are left to "
    "Catalyst+AQE since they grow with SF.",
    tags=("join", "flagship"),
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn, quartile
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
               NTILE(4)     OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS quartile
        FROM orders
    ) t WHERE rn <= 3
    """,
    doc="Ranking windows: top-3 orders per customer by price with a unique "
    "tie-break (orderkey) so ranks are reproducible. One shuffle on the "
    "partition key.",
    tags=("window",),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    order_cols = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    w = W.partitionBy("o_custkey").orderBy(*order_cols)
    ranked = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
    )
    return ranked.filter(F.col("rn") <= 3)


@register(
    "q_window_lag",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           o_totalprice - COALESCE(LAG(o_totalprice) OVER w, o_totalprice) AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Analytic windows: lag/lead over a deterministic per-customer "
    "order-date sequence.",
    tags=("window",),
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - F.coalesce(prev, F.col("o_totalprice"))).alias("delta"),
    )


@register(
    "q_window_frame",
    oracle=f"""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) OVER w_run
                AS VARCHAR) AS DOUBLE) AS running_rev,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) OVER w_5
                AS VARCHAR) AS DOUBLE)
             / COUNT(*) OVER w_5 AS moving_avg_5
    FROM lineitem
    WINDOW
      w_run AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_5   AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
    doc="Frame windows: running sum + 5-row moving average per supplier, "
    "decimal-exact so partial ordering differences cannot skew floats.",
    tags=("window",),
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the fixtures; adding
    # l_extendedprice makes the frame order value-deterministic — rows tied
    # on all four contribute equal values, so every prefix sum is invariant
    # under their permutation
    order_cols = ["l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice"]
    w_run = (
        W.partitionBy("l_suppkey").orderBy(*order_cols).rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_5 = W.partitionBy("l_suppkey").orderBy(*order_cols).rowsBetween(-4, W.currentRow)
    dec_price = F.col("l_extendedprice").cast("decimal(38,2)")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(dec_price).over(w_run).cast("string").cast("double").alias("running_rev"),
        (
            F.sum(dec_price).over(w_5).cast("string").cast("double")
            / F.count(F.lit(1)).over(w_5)
        ).alias("moving_avg_5"),
    )


# ---------------------------------------------------------------------------
# Sort / top-k / set ops
# ---------------------------------------------------------------------------


@register(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Global top-k -> TakeOrderedAndProject: per-partition k-row heaps, "
    "no global sort, no full shuffle. Unique tie-break for determinism.",
    tags=("sort",),
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_k(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        10,
    )


@register(
    "q_sort_multi",
    oracle="""
    SELECT c_custkey, c_mktsegment, bal
    FROM (
        SELECT c_custkey, c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        FROM customer
    ) t
    ORDER BY c_mktsegment ASC, bal DESC NULLS LAST, c_custkey
    LIMIT 50
    """,
    doc="Multi-key sort with explicit NULL placement (Spark defaults "
    "nulls-first ASC, DuckDB nulls-last — always spell it out) + limit so "
    "ordering is observable through the order-insensitive compare.",
    tags=("sort",),
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    return cust.orderBy(
        F.col("c_mktsegment").asc(), F.col("bal").desc_nulls_last(), F.col("c_custkey").asc()
    ).limit(50)


@register(
    "q_set_union",
    oracle="""
    SELECT nationkey, COUNT(*) AS n
    FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) u
    GROUP BY nationkey
    """,
    doc="UNION ALL (no dedup — pure concat of partitions, zero shuffle) "
    "followed by an aggregation.",
    tags=("setop",),
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).groupBy("nationkey").agg(F.count("*").alias("n"))


@register(
    "q_set_intersect_except",
    oracle="""
    SELECT 'intersect' AS op, k FROM
      (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey AS k FROM orders) i
    UNION ALL
    SELECT 'except' AS op, k FROM
      (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey AS k FROM orders) e
    """,
    doc="INTERSECT / EXCEPT (distinct set semantics): customers with vs "
    "without orders.",
    tags=("setop",),
)
def q_set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    ocust = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    inter = cust.intersect(ocust).select(F.lit("intersect").alias("op"), "k")
    exc = cust.exceptAll(ocust.distinct()).distinct().select(F.lit("except").alias("op"), "k")
    return inter.unionByName(exc)


@register(
    "q_window_topk_per_group",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
    FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem
    ) t WHERE rn <= 2
    """,
    doc="Top-k per group helper (operators.core.top_k_per_group) on a "
    "fact-sized table.",
    tags=("window",),
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return top_k_per_group(
        li,
        ["l_suppkey"],
        [F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
        2,
    )
