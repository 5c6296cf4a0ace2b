"""Customer-analytics operators: RFM segmentation, inter-purchase-interval
statistics, last-touch marketing attribution, and the 2-D skyline (Pareto
frontier) operator.

Reference parity: the reference's pipeline ends at a cleaned fact table
(scripts/process_sales.py:64-69); these are the first-mile analytics a
sales team runs on that table — expressed over the richer orders/events
fixtures so every shape (global quantile tiling, consecutive-row gaps,
ignore-nulls carry-forward windows, dominance filtering) is exercised.

Exactness notes (SURVEY.md §7): monetary tiles order by integer cents,
never doubles-summed-in-arbitrary-order; gap arithmetic is integer days
via the cross-engine-verified datediff/DATE_DIFF('day') pair; skyline
dominance compares integer cents and integer sizes only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.functions.exact import dec
from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.plans.registry import register

#: RFM quantile buckets per dimension (the classic 4-tile scheme).
RFM_TILES = 4


@register(
    "q_rfm",
    oracle=f"""
    WITH anchor AS (
        SELECT MAX(o_orderdate) AS tmax FROM orders
    ), per_cust AS (
        SELECT o_custkey AS custkey,
               CAST(DATE_DIFF('day', MAX(o_orderdate), (SELECT tmax FROM anchor))
                    AS BIGINT)                                   AS recency_days,
               COUNT(*)                                          AS frequency,
               SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0)))    AS monetary_c
        FROM orders
        GROUP BY o_custkey
    ), tiled AS (
        SELECT custkey, recency_days, frequency, monetary_c,
               NTILE({RFM_TILES}) OVER (ORDER BY recency_days ASC,  custkey ASC) AS r_tile,
               NTILE({RFM_TILES}) OVER (ORDER BY frequency   DESC, custkey ASC) AS f_tile,
               NTILE({RFM_TILES}) OVER (ORDER BY monetary_c  DESC, custkey ASC) AS m_tile
        FROM per_cust
    )
    SELECT custkey, recency_days, CAST(frequency AS BIGINT) AS frequency,
           CAST(monetary_c AS DOUBLE) / 1e2 AS monetary,
           CAST(r_tile AS INTEGER) AS r_tile,
           CAST(f_tile AS INTEGER) AS f_tile,
           CAST(m_tile AS INTEGER) AS m_tile,
           CAST(r_tile * 100 + f_tile * 10 + m_tile AS INTEGER) AS rfm_code
    FROM tiled
    """,
    doc="RFM customer segmentation: per-customer Recency (days since last "
    "order vs the corpus max order date), Frequency (order count) and "
    "Monetary (exact decimal revenue), each cut into NTILE(4) quantile "
    "tiles with a fully deterministic order (metric, then custkey — NTILE "
    "is only well-defined cross-engine under a total order), composed "
    "into the classic 3-digit RFM code. Monetary tiles order by integer "
    "CENTS, so tie-breaks can never hinge on float summation order. "
    "At 100 TB: the fact scan collapses map-side to one row per customer "
    "before any window; the three global NTILEs then run over |customers| "
    "rows — already 3-4 orders smaller than the fact table — and at "
    "extreme customer counts the documented swap is broadcast "
    "approx-quantile cutpoints (q_agg_approx's lever) instead of a "
    "single-partition sort.",
    tags=("analytics", "window", "agg"),
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("tmax"))
    per_cust = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(dec(F.col("o_totalprice") * 100, 0)).alias("monetary_c"),
        )
        .join(F.broadcast(anchor))
        .select(
            "custkey",
            F.datediff(F.col("tmax"), F.col("last_order")).cast("bigint").alias("recency_days"),
            "frequency",
            "monetary_c",
        )
    )
    r_w = W.orderBy(F.col("recency_days").asc(), F.col("custkey").asc())
    f_w = W.orderBy(F.col("frequency").desc(), F.col("custkey").asc())
    m_w = W.orderBy(F.col("monetary_c").desc(), F.col("custkey").asc())
    tiled = per_cust.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_c",
        F.ntile(RFM_TILES).over(r_w).alias("r_tile"),
        F.ntile(RFM_TILES).over(f_w).alias("f_tile"),
        F.ntile(RFM_TILES).over(m_w).alias("m_tile"),
    )
    return tiled.select(
        "custkey",
        "recency_days",
        F.col("frequency").cast("bigint").alias("frequency"),
        (F.col("monetary_c").cast("double") / F.lit(1e2)).alias("monetary"),
        F.col("r_tile").cast("int").alias("r_tile"),
        F.col("f_tile").cast("int").alias("f_tile"),
        F.col("m_tile").cast("int").alias("m_tile"),
        (F.col("r_tile") * 100 + F.col("f_tile") * 10 + F.col("m_tile"))
        .cast("int")
        .alias("rfm_code"),
    )


@register(
    "q_purchase_intervals",
    oracle="""
    WITH gaps AS (
        SELECT o_custkey,
               CAST(DATE_DIFF('day', o_orderdate,
                    LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey))
                    AS BIGINT) AS gap_days
        FROM orders
    )
    SELECT o_custkey AS custkey,
           COUNT(*) + 1                       AS n_orders,
           COUNT(*)                           AS n_gaps,
           MIN(gap_days)                      AS min_gap_days,
           MAX(gap_days)                      AS max_gap_days,
           CAST(SUM(gap_days) AS DOUBLE) / COUNT(*) AS avg_gap_days
    FROM gaps
    WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    """,
    doc="Inter-purchase interval statistics: per customer, the gaps in days "
    "between consecutive orders (LEAD over a deterministic orderdate/"
    "orderkey sort) aggregated to min/max/mean — the repeat-purchase "
    "cadence feature behind churn models and replenishment forecasts. "
    "Gap arithmetic is integer days; the mean is one integer sum divided "
    "once at the end. Customers with a single order produce no gaps and "
    "drop out (COUNT(*)+1 reconstructs their order count for the rest). "
    "At 100 TB: the window is customer-partitioned — fully parallel, no "
    "global sort — and the downstream agg reuses the same customer "
    "partitioning, so Catalyst plans one exchange for both.",
    tags=("analytics", "window", "agg"),
)
def q_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    gaps = o.select(
        "o_custkey",
        F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate"))
        .cast("bigint")
        .alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return gaps.groupBy(F.col("o_custkey").alias("custkey")).agg(
        (F.count("*") + 1).alias("n_orders"),
        F.count("*").alias("n_gaps"),
        F.min("gap_days").alias("min_gap_days"),
        F.max("gap_days").alias("max_gap_days"),
        (F.sum("gap_days").cast("double") / F.count("*")).alias("avg_gap_days"),
    )


#: Channels credited by last-touch attribution; every other event type is
#: either the conversion itself ('purchase') or noise ('error').
ATTRIBUTION_CHANNELS = ("click", "view", "signup")


@register(
    "q_attribution",
    oracle=f"""
    WITH touched AS (
        SELECT event_type, value,
               LAST_VALUE(CASE WHEN event_type IN
                   ('{ATTRIBUTION_CHANNELS[0]}', '{ATTRIBUTION_CHANNELS[1]}',
                    '{ATTRIBUTION_CHANNELS[2]}') THEN event_type END
                   IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS channel
        FROM events
    )
    SELECT COALESCE(channel, 'direct') AS channel,
           COUNT(*)                    AS n_purchases,
           CAST(SUM(CAST(value * 100 AS DECIMAL(38,0))) AS DOUBLE) / 1e2
                                       AS attributed_value
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY COALESCE(channel, 'direct')
    """,
    doc="Last-touch marketing attribution: every purchase credits its full "
    "value to the user's most recent PRIOR channel event (click/view/"
    "signup), falling back to 'direct' when no touch precedes it. The "
    "carry-forward is a single ignore-nulls LAST_VALUE window over a "
    "deterministic (ts, event_id) order with a 1-PRECEDING frame — the "
    "same-timestamp self-credit trap is excluded structurally, not by "
    "filtering. Attributed revenue accumulates in exact cents. At "
    "100 TB: one user-partitioned window (parallel, no global sort) then "
    "a 4-group aggregate — map-side combine collapses everything before "
    "the final 1-row-per-channel shuffle.",
    tags=("analytics", "events", "window"),
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type").isin(*ATTRIBUTION_CHANNELS), F.col("event_type"))
    touched = ev.select(
        "event_type",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("channel"),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("channel"), F.lit("direct")).alias("channel"))
        .agg(
            F.count("*").alias("n_purchases"),
            (F.sum(dec(F.col("value") * 100, 0)).cast("double") / F.lit(1e2)).alias(
                "attributed_value"
            ),
        )
    )


@register(
    "q_skyline",
    oracle="""
    WITH pts AS (
        SELECT p_partkey, p_retailprice, p_size,
               CAST(p_retailprice * 100 AS BIGINT) AS price_c
        FROM part
    ), thresh AS (
        SELECT p_partkey, p_retailprice, p_size,
               MAX(p_size) OVER (ORDER BY price_c
                                 RANGE BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS best_cheaper
        FROM pts
    )
    SELECT p_partkey, p_retailprice, CAST(p_size AS INTEGER) AS p_size
    FROM thresh
    WHERE best_cheaper IS NULL OR p_size >= best_cheaper
    """,
    doc="2-D skyline (Pareto frontier): the parts not strictly dominated on "
    "(price low, size high) — no other part is both strictly cheaper AND "
    "strictly larger. Uses the O(n log n) sort-based formulation instead "
    "of the quadratic NOT-EXISTS self-join: order by integer price cents, "
    "take the running MAX(size) over a RANGE frame ending 1 PRECEDING "
    "(range, not rows — so equal-price rows never see each other, which "
    "is exactly the strict-dominance semantics), and keep rows at or "
    "above that threshold. Dominance compares integer cents and integer "
    "sizes only — no float in any predicate. At 100 TB: skyline commutes "
    "with union (skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))), so "
    "the scale plan is a per-partition local skyline (this same window "
    "partitioned by input split) shrinking each partition to its "
    "frontier before one tiny global pass; the global sort here is the "
    "dimension-bounded final step.",
    tags=("analytics", "window"),
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    pts = p.select(
        "p_partkey",
        "p_retailprice",
        "p_size",
        (dec(F.col("p_retailprice") * 100, 0)).cast("bigint").alias("price_c"),
    )
    w = W.orderBy("price_c").rangeBetween(W.unboundedPreceding, -1)
    thresh = pts.select(
        "p_partkey",
        "p_retailprice",
        "p_size",
        F.max("p_size").over(w).alias("best_cheaper"),
    )
    return thresh.filter(
        F.col("best_cheaper").isNull() | (F.col("p_size") >= F.col("best_cheaper"))
    ).select("p_partkey", "p_retailprice", F.col("p_size").cast("int").alias("p_size"))
