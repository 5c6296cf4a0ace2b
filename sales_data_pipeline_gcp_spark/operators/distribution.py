"""Distributional-statistics operators: inequality (Gini), rank correlation
(Spearman with ties), two-sample distribution distance (Kolmogorov-Smirnov),
volatility bands (Bollinger), drift localization (CUSUM changepoint),
calendar seasonality, and corpus-mixture concentration.

Reference parity: the reference stops at a cleaned fact table
(scripts/process_sales.py:64-69); these are the distribution-shape questions
an analyst asks of that table next (is revenue concentrated? did the
distribution shift? which day drives sales?), plus the dataset-mixture
monitor an LLM-corpus curator runs on `documents`.

Exactness discipline (SURVEY.md §7): **no transcendental functions** — libm
``log``/``exp`` differ in the last ulp across engines (see text.py tf-idf
note), so every statistic here is rational in integer counts / cents /
ranks, finishing with identical IEEE double ops. ``sqrt`` is allowed: IEEE
754 requires it correctly rounded, so it is bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.functions.exact import dec
from sales_data_pipeline_gcp_spark.io import NS_PER_SECOND, load
from sales_data_pipeline_gcp_spark.plans.registry import register


@register(
    "q_gini_concentration",
    oracle="""
    WITH per_cust AS (
        SELECT c_nationkey AS nationkey, o_custkey AS custkey,
               CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT) AS rev_c
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey, o_custkey
    ), ranked AS (
        SELECT nationkey, rev_c,
               ROW_NUMBER() OVER (PARTITION BY nationkey
                                  ORDER BY rev_c, custkey) AS i
        FROM per_cust
    )
    SELECT nationkey,
           CAST(COUNT(*) AS BIGINT)                          AS n_customers,
           CAST(SUM(rev_c) AS DOUBLE) / 1e2                  AS total_rev,
           (2.0 * CAST(SUM(i * rev_c) AS DOUBLE)
              - (CAST(COUNT(*) AS DOUBLE) + 1) * CAST(SUM(rev_c) AS DOUBLE))
             / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(rev_c) AS DOUBLE)) AS gini
    FROM ranked
    GROUP BY nationkey
    """,
    doc="Gini coefficient of customer revenue per nation — the inequality "
    "measure behind 'do 20% of customers drive 80% of revenue?'. Uses the "
    "sorted-rank formulation G = (2*SUM(i*x_i) - (n+1)*SUM(x)) / "
    "(n*SUM(x)) over revenue in integer CENTS with a deterministic "
    "(revenue, custkey) rank order, so everything up to the final double "
    "division is exact integer arithmetic (sums stay < 2^53 with ~160x "
    "margin at sf0.1; the documented swap beyond that is scale-0 decimal "
    "accumulation). No transcendentals anywhere. At 100 TB: the fact scan "
    "collapses map-side to one row per customer; the rank window is "
    "nation-partitioned (parallel), and the final agg reuses the same "
    "partitioning — Catalyst plans one exchange for window+agg.",
    tags=("stats", "window", "agg"),
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"), F.col("o_custkey").alias("custkey"))
        .agg(F.sum(dec(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("rev_c"))
    )
    w = W.partitionBy("nationkey").orderBy(F.col("rev_c").asc(), F.col("custkey").asc())
    ranked = per_cust.select("nationkey", "rev_c", F.row_number().over(w).alias("i"))
    n = F.count("*").cast("double")
    s = F.sum("rev_c").cast("double")
    t = F.sum(F.col("i") * F.col("rev_c")).cast("double")
    return ranked.groupBy("nationkey").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        (F.sum("rev_c").cast("double") / F.lit(1e2)).alias("total_rev"),
        ((F.lit(2.0) * t - (n + 1) * s) / (n * s)).alias("gini"),
    )


@register(
    "q_spearman_corr",
    oracle="""
    WITH vals AS (
        SELECT CAST(p_retailprice * 100 AS BIGINT) AS price_c,
               CAST(p_size AS BIGINT) AS size_v
        FROM part
    ), ranked AS (
        -- average ranks with ties, held exactly as 2*avg_rank =
        -- 2*RANK + (tie_count - 1): an INTEGER ("half-rank units")
        SELECT (2 * RANK() OVER (ORDER BY price_c)
                  + COUNT(*) OVER (PARTITION BY price_c) - 1) AS ax,
               (2 * RANK() OVER (ORDER BY size_v)
                  + COUNT(*) OVER (PARTITION BY size_v) - 1)  AS ay
        FROM vals
    ), sums AS (
        SELECT CAST(COUNT(*) AS DOUBLE)    AS n,
               CAST(SUM(ax) AS DOUBLE)     AS sx,
               CAST(SUM(ay) AS DOUBLE)     AS sy,
               CAST(SUM(ax * ax) AS DOUBLE) AS sxx,
               CAST(SUM(ay * ay) AS DOUBLE) AS syy,
               CAST(SUM(ax * ay) AS DOUBLE) AS sxy
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_parts,
           (n * sxy - sx * sy)
             / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS spearman_rho
    FROM sums
    """,
    doc="Spearman rank correlation between part price and part size, with "
    "textbook tie handling: each value's AVERAGE rank, held exactly in "
    "integer 'half-rank units' 2*avg_rank = 2*RANK() + (ties-1), then "
    "Pearson's formula over those integers (the 6*SUM(d^2) shortcut is "
    "invalid under ties). Every accumulation is an integer sum; each sum "
    "is cast to double while still < 2^53, and the cross products run in "
    "identical IEEE double ops (sqrt is IEEE-exact). Monotone-invariant, "
    "so it catches nonlinear price-size association Pearson misses. At "
    "100 TB: the two global rank windows are the documented bottleneck — "
    "the swap is a range-partitioned sort (rank = partition offset + "
    "local rank) exactly like the q_sort_multi scale note; sums then "
    "combine map-side.",
    tags=("stats", "window"),
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    vals = p.select(
        dec(F.col("p_retailprice") * 100, 0).cast("bigint").alias("price_c"),
        F.col("p_size").cast("bigint").alias("size_v"),
    )
    ranked = vals.select(
        (
            F.lit(2) * F.rank().over(W.orderBy("price_c"))
            + F.count("*").over(W.partitionBy("price_c"))
            - 1
        ).alias("ax"),
        (
            F.lit(2) * F.rank().over(W.orderBy("size_v"))
            + F.count("*").over(W.partitionBy("size_v"))
            - 1
        ).alias("ay"),
    )
    sums = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("ax").cast("double").alias("sx"),
        F.sum("ay").cast("double").alias("sy"),
        F.sum(F.col("ax") * F.col("ax")).cast("double").alias("sxx"),
        F.sum(F.col("ay") * F.col("ay")).cast("double").alias("syy"),
        F.sum(F.col("ax") * F.col("ay")).cast("double").alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (F.col(k) for k in ("n", "sx", "sy", "sxx", "syy", "sxy"))
    return sums.select(
        n.cast("bigint").alias("n_parts"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("spearman_rho"),
    )


#: The two order-status populations whose price distributions KS compares.
KS_GROUP_A, KS_GROUP_B = "O", "F"


@register(
    "q_ks_test",
    oracle=f"""
    WITH pts AS (
        SELECT CAST(o_totalprice * 100 AS BIGINT) AS price_c,
               COUNT(*) FILTER (WHERE o_orderstatus = '{KS_GROUP_A}') AS ca,
               COUNT(*) FILTER (WHERE o_orderstatus = '{KS_GROUP_B}') AS cb
        FROM orders
        WHERE o_orderstatus IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
        GROUP BY 1
    ), cum AS (
        SELECT price_c,
               SUM(ca) OVER (ORDER BY price_c) AS cuma,
               SUM(cb) OVER (ORDER BY price_c) AS cumb,
               SUM(ca) OVER ()                 AS na,
               SUM(cb) OVER ()                 AS nb
        FROM pts
    ), dev AS (
        SELECT price_c, na, nb,
               ABS(cuma * nb - cumb * na) AS d_num
        FROM cum
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           CAST(MAX(d_num) AS BIGINT) AS d_num,
           CAST(MAX(d_num) AS DOUBLE)
             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ks_stat,
           CAST(MIN(CASE WHEN d_num = (SELECT MAX(d_num) FROM dev)
                         THEN price_c END) AS DOUBLE) / 1e2 AS ks_at
    FROM dev
    GROUP BY na, nb
    """,
    doc="Two-sample Kolmogorov-Smirnov statistic comparing the order-price "
    "distributions of open ('O') vs fulfilled ('F') orders — the "
    "distribution-shift monitor a pipeline runs between snapshots. "
    "D = max|F_a(x) - F_b(x)| is computed entirely in integers: per "
    "distinct price (cents) the two conditional counts, cumulative counts "
    "by a window sum, and the deviation held as the integer cross-product "
    "|cum_a*n_b - cum_b*n_a| (max ~6e9, exact); only the final "
    "normalization divides doubles. The max-achieving price reports where "
    "the distributions diverge most (earliest on ties). At 100 TB: the "
    "grouped count collapses the scan to |distinct prices| rows before "
    "the single ordered window; the documented swap for extreme "
    "cardinality is the same range-partitioned cumulative-sum rewrite as "
    "q_cumulative_users.",
    tags=("stats", "window"),
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    pts = (
        o.filter(F.col("o_orderstatus").isin(KS_GROUP_A, KS_GROUP_B))
        .groupBy(dec(F.col("o_totalprice") * 100, 0).cast("bigint").alias("price_c"))
        .agg(
            F.count(F.when(F.col("o_orderstatus") == KS_GROUP_A, 1)).alias("ca"),
            F.count(F.when(F.col("o_orderstatus") == KS_GROUP_B, 1)).alias("cb"),
        )
    )
    w_cum = W.orderBy("price_c").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    cum = pts.select(
        "price_c",
        F.sum("ca").over(w_cum).alias("cuma"),
        F.sum("cb").over(w_cum).alias("cumb"),
        F.sum("ca").over(w_all).alias("na"),
        F.sum("cb").over(w_all).alias("nb"),
    )
    dev = cum.select(
        "price_c",
        "na",
        "nb",
        F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")).alias("d_num"),
    )
    w_max = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        dev.withColumn("dmax", F.max("d_num").over(w_max))
        .groupBy("na", "nb")
        .agg(
            F.max("d_num").cast("bigint").alias("d_num"),
            (
                F.max("d_num").cast("double")
                / (F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("ks_stat"),
            (
                F.min(F.when(F.col("d_num") == F.col("dmax"), F.col("price_c"))).cast("double")
                / F.lit(1e2)
            ).alias("ks_at"),
        )
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            "d_num",
            "ks_stat",
            "ks_at",
        )
    )


#: Bollinger lookback in trading periods (days with >=1 order) and the
#: band half-width in standard deviations.
BOLL_WINDOW = 7
BOLL_K = 2.0


@register(
    "q_bollinger_bands",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT) AS rev_c
        FROM orders GROUP BY o_orderdate
    ), rolled AS (
        SELECT d, rev_c,
               COUNT(*) OVER w                                   AS n_w,
               CAST(CAST(SUM(rev_c) OVER w AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(SUM(CAST(rev_c AS DECIMAL(38,0))
                        * CAST(rev_c AS DECIMAL(38,0))) OVER w AS VARCHAR) AS DOUBLE) AS sxx
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN {BOLL_WINDOW - 1} PRECEDING AND CURRENT ROW)
    )
    , bands AS (
        SELECT d, rev_c, n_w, sx,
               SQRT(GREATEST((sxx - sx * sx / {BOLL_WINDOW}) / {BOLL_WINDOW - 1}, 0)) AS sdev
        FROM rolled
    )
    SELECT d, CAST(rev_c AS DOUBLE) / 1e2 AS revenue,
           sx / {BOLL_WINDOW} / 1e2 AS ma,
           sdev / 1e2 AS sd,
           (sx / {BOLL_WINDOW} + {BOLL_K} * sdev) / 1e2 AS upper_band,
           (sx / {BOLL_WINDOW} - {BOLL_K} * sdev) / 1e2 AS lower_band,
           CAST(CASE
                WHEN CAST(rev_c AS DOUBLE) > sx / {BOLL_WINDOW} + {BOLL_K} * sdev THEN 1
                WHEN CAST(rev_c AS DOUBLE) < sx / {BOLL_WINDOW} - {BOLL_K} * sdev THEN -1
                ELSE 0 END AS INTEGER) AS breakout
    FROM bands
    WHERE n_w = {BOLL_WINDOW}
    """,
    doc=f"Bollinger bands over daily revenue: {BOLL_WINDOW}-period rolling "
    f"mean +/- {BOLL_K} sample standard deviations, with a breakout flag "
    "(+1 above the upper band, -1 below the lower) — the volatility-"
    "normalized anomaly monitor for a revenue time series. The rolling "
    "sums accumulate integer cents and scale-0 decimal cents-squared "
    "(exact, order-free) and convert to double THROUGH A STRING on both "
    "engines: the squared-cents window sum reaches ~6e20 at sf0.1 (far "
    "past 2^53), where DuckDB's int128->double composition and Spark's "
    "conversion differ by 1 ulp that the sum-of-squares cancellation "
    "amplifies into the sd/band digits — measured 23/2399 divergent rows "
    "at sf0.1 and 6/2399 at sf1 with the old direct cast (round-8 sf1 "
    "parity sweep; see functions/exact.py). Variance comes from the "
    "sum-of-squares formula in identical IEEE ops, sqrt is IEEE-exact; "
    "the discriminant is guarded SQRT(GREATEST(d, 0)) both sides so a "
    "zero-variance window rounding to a tiny negative yields sd = 0 on "
    "both engines instead of Spark NaN vs DuckDB error (exact.py ledger "
    "item 6, closed round 12). "
    "Warm-up rows with fewer "
    f"than {BOLL_WINDOW} periods are excluded structurally rather than "
    "emitting degenerate bands. At 100 TB: the scan collapses map-side "
    "to one row per day (~thousands of rows regardless of fact size), so "
    "the single ordered window is trivially small; partition by "
    "year/security/nation when the series multiplies.",
    tags=("stats", "window", "timeseries"),
)
def q_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(dec(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("rev_c")
    )
    w = W.orderBy("d").rowsBetween(-(BOLL_WINDOW - 1), W.currentRow)
    rolled = daily.select(
        "d",
        "rev_c",
        F.count("*").over(w).alias("n_w"),
        F.sum("rev_c").over(w).cast("string").cast("double").alias("sx"),
        F.sum(dec(F.col("rev_c"), 0) * dec(F.col("rev_c"), 0)).over(w).cast("string").cast("double").alias("sxx"),
    )
    nw = F.lit(float(BOLL_WINDOW))
    sx, sxx = F.col("sx"), F.col("sxx")
    ma = sx / nw
    # SQRT(GREATEST(d, 0)) both sides: a zero-variance window whose squared
    # sums exceed 2^53 can round the discriminant to a tiny negative —
    # Spark would emit NaN while DuckDB RAISES (exact.py ledger item 6,
    # closed round 12). Guarded form pre-validated bit-exact, incl. tiny
    # negatives and signed zero (tests/test_differential_fuzz.py §35).
    sd = F.sqrt(F.greatest((sxx - sx * sx / nw) / F.lit(float(BOLL_WINDOW - 1)), F.lit(0)))
    upper = ma + F.lit(BOLL_K) * sd
    lower = ma - F.lit(BOLL_K) * sd
    rev_d = F.col("rev_c").cast("double")
    return rolled.filter(F.col("n_w") == BOLL_WINDOW).select(
        "d",
        (rev_d / F.lit(1e2)).alias("revenue"),
        (ma / F.lit(1e2)).alias("ma"),
        (sd / F.lit(1e2)).alias("sd"),
        (upper / F.lit(1e2)).alias("upper_band"),
        (lower / F.lit(1e2)).alias("lower_band"),
        F.when(rev_d > upper, 1).when(rev_d < lower, -1).otherwise(0).cast("int").alias("breakout"),
    )


@register(
    "q_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type, epoch_ns(ts) // 86400000000000 AS d, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, d, c,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS k,
               SUM(c) OVER (PARTITION BY event_type ORDER BY d)       AS cum_c,
               COUNT(*) OVER (PARTITION BY event_type)                AS n_days,
               SUM(c) OVER (PARTITION BY event_type)                  AS total
        FROM daily
    ), dev AS (
        SELECT event_type, d, n_days, total,
               ABS(n_days * cum_c - k * total) AS d_num,
               MAX(ABS(n_days * cum_c - k * total))
                   OVER (PARTITION BY event_type) AS d_max
        FROM cum
    )
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(total AS BIGINT)  AS total_events,
           CAST(MIN(d) AS BIGINT) AS change_day,
           CAST(d_max AS BIGINT)  AS d_num,
           CAST(d_max AS DOUBLE)
             / (CAST(n_days AS DOUBLE) * CAST(total AS DOUBLE)) AS cusum_stat
    FROM dev
    WHERE d_num = d_max
    GROUP BY event_type, n_days, total, d_max
    """,
    doc="CUSUM changepoint localization per event type: over the daily "
    "count series, the deviation of the cumulative sum from the uniform-"
    "rate line is held as the INTEGER |n*cum_k - k*total| (the exact "
    "rational form of |cum_k/total - k/n| — no division until the end), "
    "and the reported changepoint is the earliest day achieving the "
    "maximum — where the rate most decisively shifted. Day keys use the "
    "engine-wide integer epoch-day bucket (ts div ns-per-day — io.py ts "
    "contract). This is the offline analog of streaming drift detectors: "
    "pure integer "
    "arithmetic, reproducible everywhere. At 100 TB: the scan collapses "
    "map-side to (type, day) rows; all windows share one event_type "
    "partitioning, so Catalyst plans a single exchange for the whole "
    "chain.",
    tags=("stats", "window", "events"),
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr(f"ts div {NS_PER_SECOND * 86400}").alias("d")
    ).agg(F.count("*").alias("c"))
    w_ord = W.partitionBy("event_type").orderBy("d")
    w_all = W.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "d",
        F.row_number().over(w_ord).alias("k"),
        F.sum("c").over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("cum_c"),
        F.count("*").over(w_all).alias("n_days"),
        F.sum("c").over(w_all).alias("total"),
    )
    dev = cum.select(
        "event_type",
        "d",
        "n_days",
        "total",
        F.abs(F.col("n_days") * F.col("cum_c") - F.col("k") * F.col("total")).alias("d_num"),
    ).withColumn("d_max", F.max("d_num").over(w_all))
    return (
        dev.filter(F.col("d_num") == F.col("d_max"))
        .groupBy("event_type", "n_days", "total", "d_max")
        .agg(F.min("d").cast("bigint").alias("change_day"))
        .select(
            "event_type",
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("total").cast("bigint").alias("total_events"),
            "change_day",
            F.col("d_max").cast("bigint").alias("d_num"),
            (
                F.col("d_max").cast("double")
                / (F.col("n_days").cast("double") * F.col("total").cast("double"))
            ).alias("cusum_stat"),
        )
    )


@register(
    "q_dow_seasonality",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT) AS rev_c
        FROM orders GROUP BY o_orderdate
    ), per_dow AS (
        SELECT CAST(date_part('dow', d) AS INTEGER) AS dow,
               COUNT(*)   AS n_days,
               SUM(rev_c) AS rev_c
        FROM daily GROUP BY 1
    ), overall AS (
        SELECT SUM(n_days) AS all_days, SUM(rev_c) AS all_rev FROM per_dow
    )
    SELECT dow,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(p.rev_c AS DOUBLE) / 1e2 AS revenue,
           CAST(p.rev_c AS DOUBLE) / CAST(n_days AS DOUBLE) / 1e2 AS avg_day_revenue,
           (CAST(p.rev_c AS DOUBLE) / CAST(n_days AS DOUBLE))
             / (CAST(all_rev AS DOUBLE) / CAST(all_days AS DOUBLE)) AS seasonal_index
    FROM per_dow p, overall
    """,
    doc="Day-of-week seasonality index: average daily revenue per weekday "
    "divided by the overall average daily revenue — index > 1 marks the "
    "days that over-drive sales, the input to staffing and promo "
    "calendars. Day keying uses dow 0=Sunday..6 (Spark dayofweek()-1 == "
    "DuckDB date_part('dow')); revenue accumulates in exact integer "
    "cents, and the index is a ratio of two identically-computed doubles. "
    "At 100 TB: two map-side-collapsing aggregations (fact -> day -> "
    "dow, 7 rows) and a broadcast of the single overall row — "
    "replication factor 1, no large-side shuffle after the first "
    "per-day combine.",
    tags=("stats", "agg", "timeseries"),
)
def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(dec(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("rev_c")
    )
    per_dow = daily.groupBy((F.dayofweek("d") - 1).cast("int").alias("dow")).agg(
        F.count("*").alias("n_days"), F.sum("rev_c").alias("rev_c")
    )
    overall = per_dow.agg(
        F.sum("n_days").alias("all_days"), F.sum("rev_c").alias("all_rev")
    )
    rev_d = F.col("rev_c").cast("double")
    nd = F.col("n_days").cast("double")
    return per_dow.join(F.broadcast(overall)).select(
        "dow",
        F.col("n_days").cast("bigint").alias("n_days"),
        (rev_d / F.lit(1e2)).alias("revenue"),
        (rev_d / nd / F.lit(1e2)).alias("avg_day_revenue"),
        (
            (rev_d / nd)
            / (F.col("all_rev").cast("double") / F.col("all_days").cast("double"))
        ).alias("seasonal_index"),
    )


@register(
    "q_mix_effective_sources",
    oracle="""
    WITH per_src AS (
        SELECT lang, source, COUNT(*) AS c
        FROM documents GROUP BY lang, source
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT)   AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
             / CAST(SUM(c * c) AS DOUBLE)                    AS effective_sources,
           CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)   AS dominance
    FROM per_src
    GROUP BY lang
    """,
    doc="Corpus-mixture concentration per language: the inverse-Simpson "
    "'effective number of sources' N^2 / SUM(c_i^2) plus the dominance "
    "share of the largest source — the dataset-mixture monitor an "
    "LLM-corpus curator tracks to catch a language silently collapsing "
    "onto one crawl source. Inverse Simpson is the RATIONAL diversity "
    "index (unlike Shannon entropy it needs no log, which is not "
    "bit-reproducible cross-engine — see the tf-idf linear-idf note); "
    "all sums are integer counts. Complements q_text_diversity "
    "(char-level, within-document) and q_source_diversity at the "
    "corpus-mixture level. At 100 TB: two map-side-collapsing "
    "aggregations, output |langs| rows; no join, no window.",
    tags=("text", "agg", "llm"),
)
def q_mix_effective_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    per_src = d.groupBy("lang", "source").agg(F.count("*").alias("c"))
    s = F.sum("c").cast("double")
    return per_src.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_sources"),
        ((s * s) / F.sum(F.col("c") * F.col("c")).cast("double")).alias("effective_sources"),
        (F.max("c").cast("double") / s).alias("dominance"),
    )
