"""TPC-H-shaped composite queries over the fixture star schema — the
multi-operator compositions an analytics engine is actually judged on
(filter + multi-join + agg + having + top-k in one plan). Shapes follow the
public TPC-H spec (Q3/Q7/Q18 analogues, adapted to the fixture columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.functions.exact import dec, exact_sum, sql_sum
from sales_data_pipeline_gcp_spark.io import fan_out, load
from sales_data_pipeline_gcp_spark.plans.registry import register


@register(
    "q_tpch_q1_pricing",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {sql_sum('l_quantity', 2)}      AS sum_qty,
           {sql_sum('l_extendedprice', 2)} AS sum_base_price,
           {sql_sum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                              AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_charge,
           {sql_sum('l_quantity', 2)} / COUNT(l_quantity)           AS avg_qty,
           {sql_sum('l_extendedprice', 2)} / COUNT(l_extendedprice) AS avg_price,
           {sql_sum('l_discount', 2)} / COUNT(l_discount)           AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape (pricing summary report): one full-fact-table scan, "
    "date filter pushed to the parquet scan, 8 aggregates over 2 grouping "
    "keys — partial aggregation collapses everything map-side, so the "
    "shuffle carries |groups| x |aggs| values per partition regardless of "
    "data size (the canonical 100 TB-friendly aggregate). Exactness: each "
    "product is accumulated at the scale that represents it exactly "
    "(quantity/price 2, disc_price 4, charge 6); charge's exact sum "
    "overflows the 2^53 decimal->double safety bound at scale 6, so it is "
    "ROUNDed to 2 decimals AS A DECIMAL first — Spark round and DuckDB "
    "ROUND both round half away from zero (verified), and the rounded "
    "unscaled value is back inside exact-double range.",
    tags=("flagship", "tpch"),
)
def q_tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # filter first (pushdown reaches the scan), project to the 7 needed
    # columns, then fan_out so the decimal partial aggregation does not
    # serialize on a single input split (io.fan_out; guide §2.2) —
    # decimal sums and counts are order-independent
    li = fan_out(
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        )
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", 2).alias("sum_qty"),
            exact_sum("l_extendedprice", 2).alias("sum_base_price"),
            exact_sum(disc_price, 4).alias("sum_disc_price"),
            F.round(F.sum(dec(charge, 6)), 2).cast("double").alias("sum_charge"),
            (exact_sum("l_quantity", 2) / F.count("l_quantity")).alias("avg_qty"),
            (exact_sum("l_extendedprice", 2) / F.count("l_extendedprice")).alias("avg_price"),
            (exact_sum("l_discount", 2) / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_tpch_q3_shipping",
    oracle=f"""
    SELECT l_orderkey,
           {sql_sum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): segment filter pushed to the "
    "customer scan, date filters pushed to orders/lineitem scans BEFORE the "
    "joins, then agg + top-10. The filters prune most of both fact tables "
    "pre-shuffle — the single most important join optimization at 100 TB.",
    tags=("flagship", "tpch"),
)
def q_tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1997-06-01 00:00:00").cast("timestamp")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q_tpch_q7_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_sum('volume', 6)} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape (cross-nation volume): six-way join with a "
    "non-equi predicate between the two nation dims (both broadcast), "
    "derived year column, grouped exact revenue.",
    tags=("flagship", "tpch"),
)
def q_tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    n1 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .select("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"), volume.alias("volume"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(exact_sum("volume", 6).alias("revenue"))
    )


@register(
    "q_tpch_q5_local_supplier",
    oracle=f"""
    SELECT n_name, {sql_sum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape (local supplier volume): the classic 6-way join "
    "with a LOCAL constraint (customer and supplier in the same nation — "
    "an extra equi-predicate on the supplier join, not a new shuffle key). "
    "region/nation broadcast; the orders date range prunes the fact side "
    "before the shuffle joins; final agg is 25 groups, collapsed map-side.",
    tags=("flagship", "tpch"),
)
def q_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(exact_sum(revenue, 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@register(
    "q_tpch_q10_returns",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_sum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           c_acctbal, n_name, c_mktsegment
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): one-quarter order "
    "window + returnflag filter both pushed to the scans, 4-way join, "
    "group by the customer identity columns, exact revenue, deterministic "
    "top-20 (revenue DESC, c_custkey tiebreak — the spec's LIMIT alone is "
    "tie-ambiguous and would flap the hash).",
    tags=("flagship", "tpch"),
)
def q_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(exact_sum(revenue, 6).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q_tpch_q18_big_orders",
    oracle=f"""
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {sql_sum('l_quantity', 2)} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 150
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape (large-volume orders): HAVING-filtered IN-subquery "
    "(compiles to an aggregate + semi-join that shrinks orders BEFORE the "
    "wide join), then re-aggregation and top-k.",
    tags=("flagship", "tpch"),
)
def q_tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,2)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    orders = load(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    cust = load(spark, sf_dir, "customer")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(exact_sum("l_quantity", 2).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@register(
    "q_tpch_q4_late_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order-priority checking; reference Q4 uses "
    "commitdate<receiptdate — the fixture carries shipdate only, so 'late' "
    "is shipdate > orderdate + 60 days): a correlated EXISTS whose "
    "predicate references the OUTER row's date, compiled to a left-semi "
    "join with a compound equi+range condition. The semi join dedups "
    "order keys during the probe — no post-join distinct, no row "
    "explosion from multi-line orders — and the date filter prunes the "
    "orders scan before the shuffle. At 100 TB both sides shuffle once "
    "on orderkey; AQE picks broadcast if the filtered year is small.",
    tags=("tpch",),
)
def q_tpch_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q_tpch_q14_promo",
    oracle=f"""
    SELECT 100.0 * {sql_sum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) END", 4)}
                 / {sql_sum('l_extendedprice * (1 - l_discount)', 4)} AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape (promotion effect): conditional-aggregate ratio — "
    "promo revenue share of one ship-month. The month filter reaches the "
    "parquet scan (partition-prunable at scale); part joins broadcast; "
    "both sums accumulate exact decimals so the final double division is "
    "the same IEEE op in both engines (100.0 * promo / total, evaluated "
    "left-to-right identically).",
    tags=("tpch",),
)
def q_tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    part = F.broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_type"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * exact_sum(F.when(F.col("p_type") == "PROMO", disc), 4)
                / exact_sum(disc, 4)
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q_tpch_q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type  <> 'PROMO'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship; the fixture has no "
    "partsupp table, so lineitem is the part-supplier association): "
    "NOT-IN denylist subquery (compiled to a broadcast anti-join — the "
    "denylist is the handful of negative-balance suppliers) + distinct "
    "count per (brand, type, size). COUNT(DISTINCT) shuffles the "
    "already-deduped (group, suppkey) pairs once; the part dimension "
    "broadcasts with its predicates applied before the join.",
    tags=("tpch",),
)
def q_tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = F.broadcast(
        load(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO"))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    deny = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(deny, "l_suppkey", "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_tpch_q19_disjunctive",
    oracle=f"""
    SELECT COUNT(*) AS n_lines,
           {sql_sum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (discounted revenue, disjunctive predicates): an "
    "OR-of-ANDs spanning both join sides. Catalyst extracts the "
    "single-side conjuncts it can (brand/size membership prunes the "
    "broadcast part build; the quantity envelope 1-30 prunes the fact "
    "scan) and evaluates the full disjunction post-join — the classic "
    "test that an optimizer doesn't give up on pushdown when predicates "
    "disjoin. Revenue accumulates exactly at scale 4.",
    tags=("tpch",),
)
def q_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size"))
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    arm = lambda brand, szlo, szhi, qlo, qhi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(szlo, szhi)
        & F.col("l_quantity").between(qlo, qhi)
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.filter(
            arm("Brand#12", 1, 15, 1, 11)
            | arm("Brand#23", 1, 25, 10, 20)
            | arm("Brand#3", 1, 35, 20, 30)
        ).agg(
            F.count("*").alias("n_lines"),
            exact_sum(disc, 4).alias("revenue"),
        )
    )


@register(
    "q_tpch_q21_waiting",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders   o  ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting; 'late' = "
    "shipdate > orderdate + 60 days since the fixture has no "
    "commit/receipt dates): the hardest subquery pattern in the suite — "
    "a correlated EXISTS plus a correlated NOT EXISTS over the same "
    "fact table. Instead of compiling two more joins per quantifier, the "
    "engine aggregates order-level facts ONCE (distinct-supplier count, "
    "distinct-LATE-supplier count per order) and turns both quantifiers "
    "into cheap scalar predicates (n_supp >= 2 ⇔ EXISTS another "
    "supplier; n_late_supp = 1 ⇔ NOT EXISTS another late one): two "
    "narrow aggregates + one join on orderkey replace four "
    "correlated-subquery scans. Deterministic top-k: numwait DESC then "
    "unique s_name.",
    tags=("flagship", "tpch"),
)
def q_tpch_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select("l_orderkey", "l_suppkey")
    n_supp = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    n_late = (
        late.select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_late_supp"))
    )
    waiting = (
        late.join(n_supp, "l_orderkey")
        .join(n_late, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    supp = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        waiting.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


@register(
    "q_tpch_q22_idle_rich",
    oracle=f"""
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           {sql_sum('c_acctbal', 2)} AS totacctbal
    FROM customer c
    WHERE c_acctbal > (
        SELECT {sql_sum('c_acctbal', 2)} / COUNT(c_acctbal)
        FROM customer WHERE c_acctbal > 0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape (global sales opportunity; the fixture has no "
    "phone column and every customer has orders, so the anti-join "
    "condition is 'no URGENT order' and grouping is by nation): "
    "uncorrelated scalar AVG subquery (exact decimal-sum average, so the "
    "filter threshold is the same double in both engines — a 1-ulp "
    "difference here would flip membership of boundary rows) feeding a "
    "filter, then a NOT EXISTS anti-join against the filtered orders. "
    "The scalar broadcasts; the anti-join shuffles only above-average "
    "customers vs urgent orders.",
    tags=("tpch",),
)
def q_tpch_q22_idle_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    from sales_data_pipeline_gcp_spark.functions.exact import exact_avg

    avg_pos = cust.filter(F.col("c_acctbal") > 0).agg(
        exact_avg("c_acctbal", 2).alias("avg_bal")
    )
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            exact_sum("c_acctbal", 2).alias("totacctbal"),
        )
    )


@register(
    "q_tpch_q8_market_share",
    oracle=f"""
    WITH rev AS (
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               ns.n_name AS supp_nation
        FROM lineitem l
        JOIN orders   o  ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey  = c.c_custkey
        JOIN nation   nc ON c.c_nationkey = nc.n_nationkey
        JOIN region   r  ON nc.n_regionkey = r.r_regionkey
        JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
        JOIN nation   ns ON s.s_nationkey = ns.n_nationkey
        JOIN part     p  ON l.l_partkey  = p.p_partkey
        WHERE r.r_name = 'ASIA'
          AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    )
    SELECT o_year,
           COALESCE({sql_sum("CASE WHEN supp_nation = 'NATION_2' THEN volume END", 4)},
                    CAST(0.0 AS DOUBLE))
             / {sql_sum('volume', 4)} AS mkt_share,
           {sql_sum('volume', 4)} AS total_rev,
           COUNT(*) AS n_lines
    FROM rev GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): one nation's revenue share "
    "of ECONOMY-part sales to ASIA customers, by order year — an 8-way "
    "star join feeding a conditional-aggregate ratio. nation/region/part "
    "broadcast with predicates applied pre-join; orders carries the year "
    "envelope to the scan. The share divides two exact decimal sums of "
    "the SAME volume expression (missing nation-years coalesce to 0.0 "
    "identically in both engines).",
    tags=("tpch",),
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nc = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
        )
    )
    region = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    ns = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    part = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nc, cust.c_nationkey == F.col("cn_key"))
        .join(region, F.col("cn_region") == F.col("r_regionkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(ns, supp.s_nationkey == F.col("sn_key"))
        .join(part, li.l_partkey == F.col("p_partkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    return rev.groupBy("o_year").agg(
        (
            F.coalesce(
                exact_sum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume")), 4),
                F.lit(0.0),
            )
            / exact_sum("volume", 4)
        ).alias("mkt_share"),
        exact_sum("volume", 4).alias("total_rev"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q_tpch_q11_important_parts",
    oracle=f"""
    WITH pv AS (
        SELECT l.l_partkey, {sql_sum('l.l_extendedprice', 2)} AS part_value
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation   n ON s.s_nationkey = n.n_nationkey
        JOIN region   r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
        GROUP BY l.l_partkey
    ), total AS (
        SELECT {sql_sum('part_value', 2)} AS total_value FROM pv
    )
    SELECT pv.l_partkey AS partkey, pv.part_value
    FROM pv CROSS JOIN total
    WHERE pv.part_value > CAST(0.0005 AS DOUBLE) * total.total_value
    """,
    doc="TPC-H Q11 shape (important stock identification; lineitem stands "
    "in for partsupp): per-part value restricted to EUROPE-region "
    "suppliers, kept only when it exceeds a fraction of the GLOBAL total "
    "— a HAVING against an uncorrelated scalar aggregate. The global "
    "total re-aggregates the per-part decimal sums (exact at both "
    "levels, so the threshold is the same double in both engines) and "
    "broadcasts as one row; no second pass over the fact table.",
    tags=("tpch",),
)
def q_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    euro_supp = F.broadcast(
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    pv = (
        li.join(euro_supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(exact_sum("l_extendedprice", 2).alias("part_value"))
    )
    total = pv.agg(exact_sum("part_value", 2).alias("total_value"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.0005).cast("double") * F.col("total_value"))
        .select(F.col("l_partkey").alias("partkey"), "part_value")
    )


@register(
    "q_tpch_q13_custdist",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): LEFT OUTER "
    "join with the priority filter in the JOIN CONDITION (not WHERE — "
    "filtering after the join would silently drop zero-order customers), "
    "COUNT of the nullable join key per customer, then a second aggregate "
    "over the counts. Two shuffles: custkey then c_count (a few dozen "
    "distinct values, collapsed map-side). The canonical "
    "histogram-of-counts-including-zero pattern.",
    tags=("tpch",),
)
def q_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q_tpch_q15_top_supplier",
    oracle=f"""
    WITH srev AS (
        SELECT l_suppkey, {sql_sum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, srev.total_revenue
    FROM srev
    CROSS JOIN (SELECT MAX(total_revenue) AS max_rev FROM srev) m
    JOIN supplier s ON srev.l_suppkey = s.s_suppkey
    WHERE srev.total_revenue = m.max_rev
    """,
    doc="TPC-H Q15 shape (top supplier): quarterly revenue per supplier, "
    "then select the supplier(s) ACHIEVING the maximum — the "
    "max-of-aggregate pattern the spec phrases as a view + scalar "
    "subquery. The revenue CTE is computed once (Spark reuses the "
    "aggregate subtree for the scalar max), the max broadcasts as one "
    "row, and the equality predicate is safe because both engines "
    "derive the identical double from the exact decimal sum.",
    tags=("tpch",),
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    srev = li.groupBy("l_suppkey").agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "total_revenue"
        )
    )
    mx = srev.agg(F.max("total_revenue").alias("max_rev"))
    supp = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        srev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q_tpch_q17_small_qty",
    oracle=f"""
    WITH brand_parts AS (
        SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'
    ), pavg AS (
        SELECT l_partkey,
               {sql_sum('l_quantity', 2)} / COUNT(l_quantity) AS avg_qty
        FROM lineitem JOIN brand_parts ON l_partkey = p_partkey
        GROUP BY l_partkey
    )
    SELECT {sql_sum('l.l_extendedprice', 2)} AS total_price,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN pavg ON l.l_partkey = pavg.l_partkey
    WHERE l.l_quantity < CAST(0.2 AS DOUBLE) * pavg.avg_qty
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): lineitems of one "
    "brand whose quantity is below 20% of that part's average quantity — "
    "the correlated scalar-AVG-per-group subquery, decorrelated into an "
    "aggregate + self-join on partkey (one extra narrow shuffle instead "
    "of a per-row subquery scan). The 0.2x threshold is double "
    "arithmetic on the exact-decimal average, so boundary rows classify "
    "identically cross-engine; the brand dimension broadcasts into both "
    "branches.",
    tags=("tpch",),
)
def q_tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sales_data_pipeline_gcp_spark.functions.exact import exact_avg

    brand_parts = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = li.join(brand_parts, li.l_partkey == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pavg = branded.groupBy("l_partkey").agg(exact_avg("l_quantity", 2).alias("avg_qty"))
    return (
        branded.withColumnRenamed("l_partkey", "b_partkey")
        .join(pavg, F.col("b_partkey") == pavg.l_partkey)
        .filter(F.col("l_quantity") < F.lit(0.2).cast("double") * F.col("avg_qty"))
        .agg(
            exact_sum("l_extendedprice", 2).alias("total_price"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q_tpch_q6_forecast",
    oracle=f"""
    SELECT {sql_sum('l_extendedprice * l_discount', 4)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecasting revenue change): a pure filtered "
    "global aggregate — every predicate (date range, discount band, "
    "quantity cap) pushes to the parquet scan, and the single SUM "
    "collapses map-side to one value per partition. The cheapest possible "
    "plan at any scale: no join, no wide shuffle, scan volume bounded by "
    "row-group pruning on l_shipdate.",
    tags=("tpch",),
)
def q_tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        exact_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue")
    )


@register(
    "q_tpch_q12_priority_class",
    oracle="""
    SELECT l_returnflag,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
               AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
               AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >  o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 shape (shipping modes / order priority; the fixture has "
    "no l_shipmode or commit/receipt dates, so the ship class is "
    "l_returnflag and 'late' is shipdate > orderdate + 90 days): "
    "orders-lineitem join with a non-equi date predicate, conditional "
    "COUNT(CASE ...) split of one pass into high/low priority tallies. "
    "The year filter prunes lineitem pre-shuffle; the priority CASE is "
    "evaluated post-join map-side, so the final agg carries 2 counters "
    "per group.",
    tags=("tpch",),
)
def q_tpch_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_tpch_q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {sql_sum('amount', 4)} AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
               l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity
                   AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (product type profit; the fixture has no partsupp, "
    "so supply cost is p_retailprice * l_quantity): 5-way join rooted at a "
    "name-filtered part dim (broadcast — the filter keeps ~13% of an "
    "already-small dim), profit per (supplier nation, order year). The "
    "part filter semi-prunes lineitem FIRST, so the orders join runs on "
    "the reduced fact; nation broadcasts. Per-row amount is "
    "IEEE-identical cross-engine (same multiply/subtract order), then "
    "exact-decimal summed.",
    tags=("tpch",),
)
def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount", "l_quantity"
    )
    supp = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = F.broadcast(load(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(exact_sum("amount", 4).alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


@register(
    "q_tpch_q20_promotion_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem
          WHERE l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
          )
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 50
      )
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape (potential part promotion; the fixture has no "
    "partsupp.ps_availqty, so the excess-stock predicate becomes shipped "
    "quantity > 50 per supplier-part): the remaining decorrelation shape "
    "— an IN whose subquery contains a nested IN AND a grouped HAVING "
    "aggregate. Compiles bottom-up: name-filtered part dim broadcast-semi-"
    "prunes lineitem, one grouped agg on (suppkey, partkey), HAVING "
    "filter, then a semi join into the region-filtered supplier dim. "
    "Every IN is a semi join (never a distinct + inner join), so no "
    "intermediate blow-up at scale.",
    tags=("tpch",),
)
def q_tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    small_parts = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_suppkey", "l_partkey", "l_quantity")
    heavy_suppliers = (
        li.join(small_parts, li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,2)")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    return (
        load(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .join(heavy_suppliers, "s_suppkey", "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q_tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               MIN(l_extendedprice / l_quantity) AS supplycost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    europe AS (
        SELECT suppkey, partkey, supplycost, s_acctbal, s_name, n_name
        FROM ps
        JOIN supplier ON s_suppkey = suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    best AS (
        SELECT partkey, MIN(supplycost) AS min_cost FROM europe GROUP BY partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           supplycost AS min_supplycost
    FROM europe
    JOIN best ON europe.partkey = best.partkey
             AND europe.supplycost = best.min_cost
    JOIN part ON p_partkey = europe.partkey
    WHERE p_size = 25
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape, FULL star output (min-cost supplier per part; the "
    "fixture has no partsupp, so the part-supplier relation is derived: "
    "supplycost = MIN unit price over that pair's lineitems): the "
    "correlated scalar-subquery-on-MIN decorrelated as groupBy-min + "
    "join-back on (partkey, cost) — ties keep ALL min-cost suppliers, "
    "exactly the spec's semantics. Region restriction applies BEFORE the "
    "per-part min (the subquery's scope), supplier/nation/region/part all "
    "broadcast, and the unit-price division is IEEE-identical "
    "cross-engine. Deterministic LIMIT: full tiebreak chain "
    "(acctbal DESC, nation, supplier, part).",
    tags=("tpch",),
)
def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"))
    )
    supp = F.broadcast(load(spark, sf_dir, "supplier"))
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    europe = (
        ps.join(supp, ps.suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("partkey", "supplycost", "s_acctbal", "s_name", "n_name")
    )
    best = europe.groupBy(F.col("partkey").alias("b_partkey")).agg(
        F.min("supplycost").alias("min_cost")
    )
    part = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_size") == 25).select("p_partkey", "p_name")
    )
    return (
        europe.join(
            best,
            (europe.partkey == best.b_partkey)
            & (europe.supplycost == best.min_cost),
        )
        .join(part, europe.partkey == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("supplycost").alias("min_supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name").asc(),
            F.col("s_name").asc(), F.col("p_partkey").asc(),
        )
        .limit(100)
    )
