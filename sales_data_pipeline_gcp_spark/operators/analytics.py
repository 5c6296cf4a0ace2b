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
           CAST(CAST(SUM(CAST(value * 100 AS DECIMAL(38,0))) AS VARCHAR)
                AS DOUBLE) / 1e2      AS attributed_value
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
            (
                F.sum(dec(F.col("value") * 100, 0)).cast("string").cast("double")
                / F.lit(1e2)
            ).alias("attributed_value"),
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


#: XYZ demand-variability class boundaries, compared as SQUARED coefficient
#: of variation so no sqrt is needed: X = steady (CV < 0.5), Y = variable
#: (CV < 1.0), Z = erratic.
XYZ_X_CV2 = 0.25
XYZ_Y_CV2 = 1.0


@register(
    "q_xyz_analysis",
    oracle=f"""
    WITH weekly AS (
        SELECT l_partkey,
               DATE_DIFF('day', DATE '1970-01-01', l_shipdate) // 7 AS wk,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,0))) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1, 2
    ), per_part AS (
        SELECT l_partkey,
               COUNT(*)                          AS n_weeks,
               CAST(SUM(qty) AS DOUBLE)          AS s,
               CAST(SUM(qty * qty) AS DOUBLE)    AS sxx,
               CAST(SUM(qty) AS BIGINT)          AS total_qty
        FROM weekly GROUP BY l_partkey
    ), classed AS (
        SELECT l_partkey, total_qty,
               CASE WHEN ((sxx - s * s / n_weeks) / (n_weeks - 1))
                         / ((s / n_weeks) * (s / n_weeks)) < {XYZ_X_CV2} THEN 'X'
                    WHEN ((sxx - s * s / n_weeks) / (n_weeks - 1))
                         / ((s / n_weeks) * (s / n_weeks)) < {XYZ_Y_CV2} THEN 'Y'
                    ELSE 'Z' END AS xyz_class
        FROM per_part
        WHERE n_weeks >= 2
    ), tot AS (
        SELECT xyz_class, COUNT(*) AS n_parts, SUM(total_qty) AS total_qty
        FROM classed GROUP BY xyz_class
    )
    SELECT xyz_class,
           CAST(n_parts AS BIGINT)   AS n_parts,
           CAST(total_qty AS BIGINT) AS total_qty,
           CAST(n_parts AS DOUBLE) / SUM(n_parts) OVER () AS share_parts
    FROM tot
    """,
    doc="XYZ demand-variability classification — the standard companion of "
    "Pareto/ABC (q_pareto_abc): per part, the coefficient of variation of "
    "WEEKLY demand (integer epoch-week buckets, the q_wow_growth "
    "convention) classes parts as X steady / Y variable / Z erratic. "
    "Variance comes from integer sum/sum-of-squares; the class test "
    "compares SQUARED CV against squared boundaries, so the whole "
    "predicate is rational — no sqrt anywhere. Parts observed in fewer "
    "than two weeks carry no variance estimate and are excluded "
    "structurally. ABC answers 'how much value'; XYZ answers 'how "
    "predictable' — together they drive stocking policy. At 100 TB: two "
    "map-side-collapsing aggregations (fact -> part-week -> part) on "
    "progressively tinier keys, a 3-row class rollup, one broadcast "
    "total.",
    tags=("analytics", "agg", "stats"),
)
def q_xyz_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO fan_out here (round 13): the driver's r12 bench read the round-12
    # repartition 1.23x slower min-of-2 (1.06 -> 1.59s single-sweep) — the
    # two-level integer rollup is too cheap per row to amortize a full-row
    # keyless repartition + its local sort (guide §2.5); the round-12 A/B
    # baseline that justified it was a storm-window reading (VERDICT r12).
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_shipdate", "l_quantity")
    weekly = li.groupBy(
        "l_partkey",
        F.expr("datediff(l_shipdate, date'1970-01-01') div 7").alias("wk"),
    ).agg(F.sum(dec(F.col("l_quantity"), 0)).cast("bigint").alias("qty"))
    per_part = weekly.groupBy("l_partkey").agg(
        F.count("*").alias("n_weeks"),
        F.sum("qty").cast("double").alias("s"),
        F.sum(F.col("qty") * F.col("qty")).cast("double").alias("sxx"),
        F.sum("qty").cast("bigint").alias("total_qty"),
    )
    n, s, sxx = F.col("n_weeks"), F.col("s"), F.col("sxx")
    cv2 = ((sxx - s * s / n) / (n - 1)) / ((s / n) * (s / n))
    classed = per_part.filter(F.col("n_weeks") >= 2).select(
        "total_qty",
        F.when(cv2 < XYZ_X_CV2, "X").when(cv2 < XYZ_Y_CV2, "Y").otherwise("Z").alias(
            "xyz_class"
        ),
    )
    tot = classed.groupBy("xyz_class").agg(
        F.count("*").alias("n_parts"), F.sum("total_qty").alias("total_qty")
    )
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return tot.select(
        "xyz_class",
        F.col("n_parts").cast("bigint").alias("n_parts"),
        F.col("total_qty").cast("bigint").alias("total_qty"),
        (F.col("n_parts").cast("double") / F.sum("n_parts").over(w_all)).alias("share_parts"),
    )


@register(
    "q_price_index",
    oracle="""
    WITH pm AS (
        SELECT l_partkey,
               CAST(date_part('year', l_shipdate) * 12
                    + date_part('month', l_shipdate) - 1 AS BIGINT) AS mon,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,0))) AS BIGINT)       AS q,
               CAST(SUM(CAST(l_extendedprice * 100 AS DECIMAL(38,0))) AS BIGINT) AS r_c
        FROM lineitem GROUP BY 1, 2
    ), base AS (
        SELECT l_partkey, q AS q0, r_c AS r0_c
        FROM pm WHERE mon = (SELECT MIN(mon) FROM pm)
    ), matched AS (
        -- Laspeyres term in FLOOR-CENT units: (revenue_cents * base_qty)
        -- intdiv current_qty is exact integer arithmetic — a double
        -- unit-price product would need quantization, and double->decimal
        -- rounding is not bit-identical cross-engine at 1e5+ terms (the
        -- double multiply before the round can cross a .5 boundary the
        -- other way). Truncation is <=1 cent per part-month and is part
        -- of the operator's definition.
        SELECT pm.mon,
               (pm.r_c * base.q0) // pm.q AS term_c,
               base.r0_c
        FROM pm JOIN base ON pm.l_partkey = base.l_partkey
    )
    SELECT mon,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           100.0 * CAST(SUM(term_c) AS DOUBLE)
                 / CAST(SUM(r0_c) AS DOUBLE) AS laspeyres_index
    FROM matched
    GROUP BY mon
    """,
    doc="Laspeyres monthly price index over the lineitem fact: for each "
    "month, the cost of the BASE month's basket at current unit prices "
    "relative to its base cost, x100 — the fixed-basket inflation measure "
    "(what would last period's purchases cost today?). Each part's term "
    "is held in exact FLOOR-CENT integer units — (revenue_cents x "
    "base_qty) intdiv current_qty — because a double unit-price product "
    "would need double->decimal quantization, which is not bit-identical "
    "cross-engine at 1e5+ terms; truncation (<=1 cent per part-month) is "
    "part of the operator's definition, and the cross-part sum is an "
    "exact integer sum. The base-cost denominator is exact cents by "
    "construction (u0*q0 == r0). Only parts present in both months enter "
    "(matched-"
    "sample index), with the month's match count reported. At 100 TB: "
    "the fact collapses map-side to (part, month); the base join keys on "
    "part — one exchange reused by the final month rollup.",
    tags=("analytics", "agg"),
)
def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pm = li.groupBy(
        "l_partkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).cast("bigint").alias("mon"),
    ).agg(
        F.sum(dec(F.col("l_quantity"), 0)).cast("bigint").alias("q"),
        F.sum(dec(F.col("l_extendedprice") * 100, 0)).cast("bigint").alias("r_c"),
    )
    # pm feeds THREE branches (the base-month scalar, the base-month part
    # table, and the matched join probe), so each branch re-runs the fact
    # rollup. Round 12 checkpointed pm here; the driver's bench read that
    # 1.32x SLOWER in both its runs (1.87 -> 2.46s) — at bench SF the
    # checkpoint job costs more than the 3x rollup re-execution saves, so
    # round 13 reverts it (VERDICT r12 item 1; driver is the arbiter). At
    # 100 TB the rollup IS the materialization candidate (orders of
    # magnitude smaller than the fact table); a production deployment
    # checkpoints or stores it — documented trade, not a code path here.
    base_mon = pm.agg(F.min("mon").alias("mon0"))
    base = (
        pm.join(F.broadcast(base_mon), pm.mon == F.col("mon0"))
        .select(F.col("l_partkey").alias("bk"), F.col("q").alias("q0"), F.col("r_c").alias("r0_c"))
    )
    matched = pm.join(base, pm.l_partkey == F.col("bk")).select(
        "mon", F.expr("(r_c * q0) div q").alias("term_c"), "r0_c"
    )
    return matched.groupBy("mon").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        (
            F.lit(100.0) * F.sum("term_c").cast("double") / F.sum("r0_c").cast("double")
        ).alias("laspeyres_index"),
    )


#: Item-CF pruning: pairs must co-occur in at least this many orders, and
#: each item reports its top-K neighbors.
CF_MIN_CO = 2
CF_TOP_K = 3


@register(
    "q_item_cf",
    oracle=f"""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), supports AS (
        SELECT pk, COUNT(*) AS n FROM baskets GROUP BY pk
    ), pairs AS (
        SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS co
        FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY a.pk, b.pk
        HAVING COUNT(*) >= {CF_MIN_CO}
    ), directed AS (
        SELECT pa AS item, pb AS neighbor, co FROM pairs
        UNION ALL
        SELECT pb AS item, pa AS neighbor, co FROM pairs
    ), scored AS (
        SELECT d.item, d.neighbor, d.co,
               CAST(d.co AS DOUBLE)
                 / (SQRT(CAST(sa.n AS DOUBLE)) * SQRT(CAST(sb.n AS DOUBLE))) AS cosine
        FROM directed d
        JOIN supports sa ON d.item = sa.pk
        JOIN supports sb ON d.neighbor = sb.pk
    ), ranked AS (
        SELECT item, neighbor, co, cosine,
               CAST(ROW_NUMBER() OVER (PARTITION BY item
                     ORDER BY cosine DESC, neighbor ASC) AS INTEGER) AS rnk
        FROM scored
    )
    SELECT item, neighbor, CAST(co AS BIGINT) AS co, cosine, rnk
    FROM ranked WHERE rnk <= {CF_TOP_K}
    """,
    doc=f"Item-item collaborative filtering: cosine similarity over order "
    "co-occurrence (co / sqrt(n_a * n_b), computed as a product of IEEE "
    "sqrts — bit-identical cross-engine since the inputs are exact "
    f"integer counts), minimum co-occurrence {CF_MIN_CO}, and each item's "
    f"top-{CF_TOP_K} neighbors under a total (cosine, neighbor) order — "
    "the classic 'customers who bought X also bought Y' recommender "
    "table. Complements q_basket_lift: lift measures association "
    "strength; cosine normalizes by popularity so hub items do not "
    "dominate every neighbor list. At 100 TB: pair volume is "
    "sum-of-k(k-1)/2 per basket (linear in orders for bounded baskets), "
    "min-support prunes before the support joins, and the per-item rank "
    "window is item-partitioned — fully parallel.",
    tags=("analytics", "similarity", "join"),
)
def q_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    baskets = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")).distinct()
    supports = baskets.groupBy("pk").agg(F.count("*").alias("n"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
        .agg(F.count("*").alias("co"))
        .filter(F.col("co") >= CF_MIN_CO)
    )
    directed = pairs.select(
        F.col("pa").alias("item"), F.col("pb").alias("neighbor"), "co"
    ).unionByName(pairs.select(F.col("pb").alias("item"), F.col("pa").alias("neighbor"), "co"))
    sa = supports.select(F.col("pk").alias("__ia"), F.col("n").alias("na"))
    sb = supports.select(F.col("pk").alias("__ib"), F.col("n").alias("nb"))
    scored = (
        directed.join(sa, F.col("item") == F.col("__ia"))
        .join(sb, F.col("neighbor") == F.col("__ib"))
        .select(
            "item",
            "neighbor",
            "co",
            (
                F.col("co").cast("double")
                / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("item").orderBy(F.col("cosine").desc(), F.col("neighbor").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= CF_TOP_K)
        .select("item", "neighbor", F.col("co").cast("bigint").alias("co"), "cosine", "rnk")
    )
