"""Time-series feature operators beyond the resample/gap-fill family in
``events_queries.py``: half-life-decayed aggregates (feature-store
freshness weighting), linear interpolation over a dense calendar spine,
and trailing-baseline anomaly flagging.

Reference parity: the reference's only time handling is ingest-time date
arithmetic (scripts/process_sales.py:55-60); these operators generalize
that single-column date math to the derived-feature shapes a training-data
pipeline computes over event history.

Exactness: every weighted sum accumulates integers or wide decimals
(dyadic weights ``2^(H-age)`` are exact BIGINTs), so partial-aggregation
order can never change a bit; the single final division to DOUBLE is the
only float op and is identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.functions.exact import dec
from sales_data_pipeline_gcp_spark.io import NS_PER_SECOND, load
from sales_data_pipeline_gcp_spark.plans.registry import register

_NS_PER_DAY = NS_PER_SECOND * 86_400

#: Half-life horizon in days: observations older than this (weight below
#: 2^-HORIZON ~ 4e-6 of the newest) truncate to zero weight and are
#: filtered before the aggregate. Keeping the exponent bounded is what
#: lets the weight be an exact BIGINT ``2^(HORIZON - age)`` instead of a
#: transcendental ``exp(-age/tau)`` whose last ulp differs across engines.
DECAY_HORIZON_DAYS = 18


@register(
    "q_decayed_avg",
    oracle=f"""
    WITH anchored AS (
        SELECT e.user_id, e.value,
               (t.tmax - epoch_ns(e.ts)) // {_NS_PER_DAY} AS age_days
        FROM events e
        CROSS JOIN (SELECT MAX(epoch_ns(ts)) AS tmax FROM events) t
    ), weighted AS (
        SELECT user_id, value,
               (CAST(1 AS BIGINT) << ({DECAY_HORIZON_DAYS} - age_days)) AS w
        FROM anchored
        WHERE age_days <= {DECAY_HORIZON_DAYS}
    )
    SELECT user_id,
           COUNT(*) AS n_recent,
           CAST(SUM(w) AS BIGINT) AS weight_sum,
           CAST(CAST(SUM(CAST(value * 100 AS DECIMAL(38,0)) * w) AS VARCHAR) AS DOUBLE)
             / (1e2 * CAST(SUM(w) AS DOUBLE)) AS decayed_avg
    FROM weighted
    GROUP BY user_id
    """,
    doc="Half-life time-decayed average value per user — the feature-store "
    "freshness aggregate (recent behavior outweighs stale behavior, "
    "half-life = 1 day). Weights are EXACT dyadic integers "
    "2^(H - age_days) with age clamped to the H-day horizon, so the "
    "weighted sum is an integer-x-decimal accumulation — merge-order "
    "independent, bit-identical cross-engine — instead of the usual "
    "exp(-age/tau) whose transcendental rounding differs by ulps across "
    "engines. The anchor (global max event time) is a broadcast scalar. "
    "At 100 TB: one map-side-combined user-keyed agg over a narrow "
    "projection; the horizon filter prunes the long tail before any "
    "shuffle, and with an event-date-partitioned layout it becomes "
    "partition pruning (q_scan_pruned's lever).",
    tags=("timeseries", "events"),
)
def q_decayed_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    tmax = ev.agg(F.max("ts").alias("tmax"))
    anchored = ev.crossJoin(F.broadcast(tmax)).select(
        "user_id",
        "value",
        F.expr(f"(tmax - ts) div {_NS_PER_DAY}").alias("age_days"),
    )
    weighted = anchored.filter(F.col("age_days") <= DECAY_HORIZON_DAYS).select(
        "user_id",
        "value",
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({DECAY_HORIZON_DAYS} - age_days AS INT))").alias("w"),
    )
    return weighted.groupBy("user_id").agg(
        F.count("*").alias("n_recent"),
        F.sum("w").alias("weight_sum"),
        (
            F.sum(dec(F.col("value") * 100, 0) * F.col("w")).cast("string").cast("double")
            / (F.lit(1e2) * F.sum("w").cast("double"))
        ).alias("decayed_avg"),
    )


@register(
    "q_timeseries_interpolate",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               epoch_ns(ts) // {_NS_PER_DAY} AS day,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS day_mean
        FROM events
        GROUP BY event_type, epoch_ns(ts) // {_NS_PER_DAY}
    ), bounds AS (
        SELECT MIN(epoch_ns(ts) // {_NS_PER_DAY}) AS dmin,
               MAX(epoch_ns(ts) // {_NS_PER_DAY}) AS dmax
        FROM events
    ), grid AS (
        SELECT t.event_type, gs.day
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (
            SELECT UNNEST(generate_series(dmin, dmax)) AS day FROM bounds
        ) gs
    ), anchored AS (
        SELECT g.event_type, g.day, d.day_mean,
               CASE WHEN d.day_mean IS NOT NULL THEN g.day END AS obs_day
        FROM grid g LEFT JOIN daily d
          ON g.event_type = d.event_type AND g.day = d.day
    ), neighbors AS (
        SELECT event_type, day, day_mean,
               LAST_VALUE(obs_day IGNORE NULLS) OVER past AS prev_day,
               LAST_VALUE(day_mean IGNORE NULLS) OVER past AS prev_val,
               FIRST_VALUE(obs_day IGNORE NULLS) OVER future AS next_day,
               FIRST_VALUE(day_mean IGNORE NULLS) OVER future AS next_val
        FROM anchored
        WINDOW past AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               future AS (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, day, day_mean,
           CASE
             WHEN day_mean IS NOT NULL THEN day_mean
             WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN
               prev_val + (next_val - prev_val)
                 * CAST(day - prev_day AS DOUBLE)
                 / CAST(next_day - prev_day AS DOUBLE)
             ELSE COALESCE(prev_val, next_val)
           END AS interp_mean
    FROM neighbors
    """,
    doc="Linear interpolation over the dense daily grid: the harder twin of "
    "q_timeseries_gapfill's forward fill. Missing days get "
    "prev + (next - prev) * (day - prev_day)/(next_day - prev_day) from "
    "the nearest observed neighbors on each side (last/first over "
    "IGNORE NULLS windows); leading/trailing gaps hold the single "
    "available neighbor. The interpolation expression is written "
    "token-identically in both engines over exact inputs (integer days, "
    "decimal-exact daily means), so the IEEE result is bit-identical. "
    "Same 100 TB posture as gapfill: the spine is |days| x |types| — the "
    "event stream collapses in the first map-side-combined rollup and "
    "every window runs over the tiny dense grid.",
    tags=("timeseries", "events", "window"),
)
def q_timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.expr(f"ts div {_NS_PER_DAY}")
    daily = (
        ev.select("event_type", day.alias("day"), "value")
        .groupBy("event_type", "day")
        .agg((F.sum(dec(F.col("value"), 2)).cast("string").cast("double") / F.count("*")).alias("day_mean"))
    )
    bounds = ev.agg(F.min(day).alias("dmin"), F.max(day).alias("dmax"))
    days = bounds.select(F.explode(F.sequence("dmin", "dmax")).alias("day"))
    grid = ev.select("event_type").distinct().crossJoin(F.broadcast(days))
    anchored = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        "day_mean",
        F.when(F.col("day_mean").isNotNull(), F.col("day")).alias("obs_day"),
    )
    past = W.partitionBy("event_type").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    future = W.partitionBy("event_type").orderBy("day").rowsBetween(0, W.unboundedFollowing)
    nb = anchored.select(
        "event_type",
        "day",
        "day_mean",
        F.last("obs_day", ignorenulls=True).over(past).alias("prev_day"),
        F.last("day_mean", ignorenulls=True).over(past).alias("prev_val"),
        F.first("obs_day", ignorenulls=True).over(future).alias("next_day"),
        F.first("day_mean", ignorenulls=True).over(future).alias("next_val"),
    )
    interp = (
        F.when(F.col("day_mean").isNotNull(), F.col("day_mean"))
        .when(
            F.col("prev_val").isNotNull() & F.col("next_val").isNotNull(),
            F.col("prev_val")
            + (F.col("next_val") - F.col("prev_val"))
            * (F.col("day") - F.col("prev_day")).cast("double")
            / (F.col("next_day") - F.col("prev_day")).cast("double"),
        )
        .otherwise(F.coalesce("prev_val", "next_val"))
    )
    return nb.select("event_type", "day", "day_mean", interp.alias("interp_mean"))


#: Trailing-baseline window (days strictly before the current day) and the
#: minimum history needed before a day can be judged at all.
ANOMALY_BASELINE_DAYS = 14
ANOMALY_MIN_HISTORY = 7
ANOMALY_SIGMA = 3


@register(
    "q_events_anomaly",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               epoch_ns(ts) // {_NS_PER_DAY} AS day,
               COUNT(*) AS n_events
        FROM events
        GROUP BY event_type, epoch_ns(ts) // {_NS_PER_DAY}
    ), base AS (
        SELECT event_type, day, n_events,
               COUNT(n_events)  OVER trail AS n_prior,
               SUM(n_events)    OVER trail AS sum_prior,
               SUM(n_events * n_events) OVER trail AS sumsq_prior
        FROM daily
        WINDOW trail AS (PARTITION BY event_type ORDER BY day
                         RANGE BETWEEN {ANOMALY_BASELINE_DAYS} PRECEDING
                                   AND 1 PRECEDING)
    )
    SELECT event_type, day, n_events, n_prior,
           CAST(sum_prior AS DOUBLE) / n_prior AS baseline_mean,
           (CAST(sumsq_prior AS DOUBLE)
              - CAST(sum_prior AS DOUBLE) * CAST(sum_prior AS DOUBLE)
                / n_prior) / n_prior AS baseline_var,
           (CAST(n_events AS DOUBLE) - CAST(sum_prior AS DOUBLE) / n_prior)
             * (CAST(n_events AS DOUBLE) - CAST(sum_prior AS DOUBLE) / n_prior)
             > {ANOMALY_SIGMA * ANOMALY_SIGMA}
               * ((CAST(sumsq_prior AS DOUBLE)
                    - CAST(sum_prior AS DOUBLE) * CAST(sum_prior AS DOUBLE)
                      / n_prior) / n_prior) AS is_anomaly
    FROM base
    WHERE n_prior >= {ANOMALY_MIN_HISTORY}
    """,
    doc="Trailing-baseline anomaly detection on daily per-type event "
    "volumes — the data-quality monitor a production ingest runs: each "
    "day is compared against the mean/variance of the prior "
    f"{ANOMALY_BASELINE_DAYS} days (RANGE frame ending at 1 PRECEDING, so "
    "the tested day never contaminates its own baseline) and flagged "
    f"when it deviates by more than {ANOMALY_SIGMA} sigma. Counts are "
    "exact integers, so sum/sumsq window accumulations are "
    "order-independent regardless of the engines' window-aggregation "
    "internals (DuckDB segment trees vs Spark running frames); the "
    "sigma test compares squared deviation against sigma^2 x variance — "
    "no sqrt, every float derives from the same integer inputs through "
    "token-identical expressions. Warm-up days with under "
    f"{ANOMALY_MIN_HISTORY} baseline days are excluded rather than "
    "judged on noise. At 100 TB the event stream collapses to "
    "|types| x |days| rows in the first map-side-combined agg; the "
    "window is over that tiny rollup.",
    tags=("timeseries", "events", "window"),
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.expr(f"ts div {_NS_PER_DAY}")
    daily = (
        ev.select("event_type", day.alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n_events"))
    )
    trail = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(-ANOMALY_BASELINE_DAYS, -1)
    )
    base = daily.select(
        "event_type",
        "day",
        "n_events",
        F.count("n_events").over(trail).alias("n_prior"),
        F.sum("n_events").over(trail).alias("sum_prior"),
        F.sum(F.col("n_events") * F.col("n_events")).over(trail).alias("sumsq_prior"),
    )
    mean = F.col("sum_prior").cast("double") / F.col("n_prior")
    var = (
        F.col("sumsq_prior").cast("double")
        - F.col("sum_prior").cast("double") * F.col("sum_prior").cast("double") / F.col("n_prior")
    ) / F.col("n_prior")
    dev = F.col("n_events").cast("double") - mean
    return base.filter(F.col("n_prior") >= ANOMALY_MIN_HISTORY).select(
        "event_type",
        "day",
        "n_events",
        "n_prior",
        mean.alias("baseline_mean"),
        var.alias("baseline_var"),
        (dev * dev > F.lit(ANOMALY_SIGMA * ANOMALY_SIGMA) * var).alias("is_anomaly"),
    )


#: Rolling-correlation window (trailing days, inclusive) over the daily
#: view/purchase volume series.
ROLLCORR_DAYS = 14


@register(
    "q_rolling_corr",
    oracle=f"""
    WITH daily AS (
        SELECT epoch_ns(ts) // {_NS_PER_DAY} AS day,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        FROM events
        GROUP BY epoch_ns(ts) // {_NS_PER_DAY}
    ), sums AS (
        SELECT day, x, y,
               COUNT(*) OVER trail AS n,
               SUM(x) OVER trail AS sx,  SUM(y) OVER trail AS sy,
               SUM(x * x) OVER trail AS sxx, SUM(y * y) OVER trail AS syy,
               SUM(x * y) OVER trail AS sxy
        FROM daily
        WINDOW trail AS (ORDER BY day RANGE BETWEEN {ROLLCORR_DAYS - 1}
                         PRECEDING AND CURRENT ROW)
    )
    SELECT day, CAST(x AS BIGINT) AS views, CAST(y AS BIGINT) AS purchases,
           CAST(n AS BIGINT) AS n_days,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (SQRT(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * SQRT(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
           END AS rolling_corr
    FROM sums
    """,
    doc="Rolling Pearson correlation between two series — trailing "
    f"{ROLLCORR_DAYS}-day correlation of daily view volume vs purchase "
    "volume, the lead-indicator diagnostic a growth team watches. All "
    "six window accumulations (n, sums, squares, cross product) are "
    "exact integers over a RANGE frame (calendar-aware: absent days "
    "shrink the frame rather than silently stretching it), the "
    "zero-variance guard is an INTEGER comparison (so no NaN ever "
    "reaches the output — NaN is the one value whose cross-engine "
    "comparison semantics are unreliable), and the closing expression "
    "is token-identical IEEE arithmetic. The daily rollup collapses "
    "the stream first; the window runs over |days| rows. The "
    "single-series global ORDER BY is dimension-bounded (one row per "
    "day) — at 100 TB of events it is still a few thousand rows.",
    tags=("timeseries", "events", "window", "stats"),
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.expr(f"ts div {_NS_PER_DAY}")
    daily = (
        ev.select(day.alias("day"), "event_type")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
        )
    )
    trail = W.orderBy("day").rangeBetween(-(ROLLCORR_DAYS - 1), 0)
    sums = daily.select(
        "day",
        "x",
        "y",
        F.count("*").over(trail).alias("n"),
        F.sum("x").over(trail).alias("sx"),
        F.sum("y").over(trail).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(trail).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(trail).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(trail).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    varx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vary = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    cov = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    guard = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0) & (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0
    )
    return sums.select(
        "day",
        F.col("x").cast("bigint").alias("views"),
        F.col("y").cast("bigint").alias("purchases"),
        F.col("n").cast("bigint").alias("n_days"),
        F.when(guard, cov / (F.sqrt(varx) * F.sqrt(vary))).alias("rolling_corr"),
    )


#: Autocorrelation lags (days) evaluated by q_acf.
ACF_LAGS = (1, 2, 3, 7)


@register(
    "q_acf",
    oracle=f"""
    WITH daily AS (
        SELECT epoch_ns(ts) // {_NS_PER_DAY} AS day,
               CAST(SUM(CAST(value * 100 AS DECIMAL(38,0))) AS BIGINT) AS v
        FROM events
        GROUP BY epoch_ns(ts) // {_NS_PER_DAY}
    ), lags AS (
        SELECT * FROM (VALUES (1), (2), (3), (7)) AS t(lag)
    ), pairs AS (
        SELECT l.lag, cur.v AS x, prev.v AS y
        FROM lags l
        JOIN daily cur ON TRUE
        JOIN daily prev ON prev.day = cur.day - l.lag
    ), sums AS (
        -- x,y are daily cent totals (~1e13 at sf1), so BIGINT products
        -- overflow int64 on BOTH engines (caught by the round-9 sf1
        -- parity sweep: ANSI long overflow at .scale/sf1). Products are
        -- computed as DECIMAL(19,0) x DECIMAL(19,0): 19 digits hold any
        -- BIGINT operand, 19+19=38 satisfies DuckDB's multiply width cap,
        -- and any int64 product fits DECIMAL(38,0) (< 8.6e37). The five
        -- sums then string-route to DOUBLE (functions/exact.py), and the
        -- variance guard runs in the same bit-identical doubles
        SELECT lag, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(SUM(CAST(y AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS syy,
               CAST(CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sxy
        FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
                 AND CAST(n AS DOUBLE) * syy - sy * sy > 0 THEN
               (CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx)
                    * SQRT(CAST(n AS DOUBLE) * syy - sy * sy))
           END AS acf
    FROM sums
    """,
    doc="Autocorrelation function of the daily revenue series at lags "
    f"{ACF_LAGS} days — the seasonality diagnostic (a spiking lag-7 means "
    "weekly cycles; a high lag-1 means momentum) run before fitting any "
    "forecast. Daily totals are exact integer cents; each lag's (x, y) "
    "pairs come from an equi-join of the series onto itself shifted by "
    "the lag (absent days drop the pair — no silent zero-fill). The five "
    "accumulations per lag are exact DECIMAL sums — BIGINT products of "
    "~1e13-cent daily totals overflow int64 at sf1 (found by the round-9 "
    "sf1 parity sweep; DECIMAL(19,0) operands keep DuckDB's 38-width "
    "multiply cap and any int64 product fits DECIMAL(38,0)) — "
    "string-routed to bit-identical doubles for the guard and the "
    "token-identical Pearson closing form (same shape as q_rolling_corr, "
    "whose count units never overflow). At 100 TB: the event stream "
    "collapses map-side to one row per day first; the lag join and "
    "aggregates then run over |days| x |lags| rows — thousands, "
    "regardless of fact scale.",
    tags=("timeseries", "events", "stats"),
)
def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(F.expr(f"ts div {_NS_PER_DAY}").alias("day"), "value")
        .groupBy("day")
        .agg(F.sum(dec(F.col("value") * 100, 0)).cast("bigint").alias("v"))
    )
    lags = spark.createDataFrame([(l,) for l in ACF_LAGS], "lag int")
    cur = daily.alias("cur")
    prev = daily.alias("prev")
    pairs = (
        F.broadcast(lags)
        .crossJoin(cur)
        .join(prev, F.col("prev.day") == F.col("cur.day") - F.col("lag"))
        .select("lag", F.col("cur.v").alias("x"), F.col("prev.v").alias("y"))
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # any BIGINT fits; 19+19=38
    s2d = lambda c: c.cast("string").cast("double")  # string-routed, exact
    sums = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        s2d(F.sum(F.col("x").cast("decimal(38,0)"))).alias("sx"),
        s2d(F.sum(F.col("y").cast("decimal(38,0)"))).alias("sy"),
        s2d(F.sum(d19("x") * d19("x"))).alias("sxx"),
        s2d(F.sum(d19("y") * d19("y"))).alias("syy"),
        s2d(F.sum(d19("x") * d19("y"))).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    varx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = nd * F.col("syy") - F.col("sy") * F.col("sy")
    cov = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    guard = (varx > 0) & (vary > 0)
    return sums.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        F.when(guard, cov / (F.sqrt(varx) * F.sqrt(vary))).alias("acf"),
    )


# --- interval calendarization (prorate spans across months) -----------------

#: fulfillment-window length synthesized per order: 10..99 days, so most
#: intervals straddle 1-4 month boundaries and the proration genuinely
#: splits.
_CAL_SPAN_SQL = "o_orderkey % 90 + 10"


@register(
    "q_calendarize",
    oracle=f"""
    WITH spans AS (
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS d0,
               CAST(o_orderdate AS DATE) + CAST({_CAL_SPAN_SQL} AS INTEGER) AS d1
        FROM orders
    ), exploded AS (
        -- scalar-list UNNEST form: DuckDB 1.0.0 rejects the lateral
        -- table-function generate_series with column parameters
        -- ("does not support lateral join column parameters").
        SELECT o_orderkey, d0, d1,
               CAST(UNNEST(generate_series(date_trunc('month', d0),
                                           date_trunc('month', d1),
                                           INTERVAL 1 MONTH)) AS DATE)
                   AS month_start
        FROM spans
    )
    SELECT strftime(month_start, '%Y-%m-%d') AS month_start,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(date_diff('day',
                              GREATEST(d0, month_start),
                              LEAST(d1, last_day(month_start))) + 1)
                AS BIGINT) AS covered_days
    FROM exploded
    GROUP BY month_start
    ORDER BY month_start
    """,
    doc="Interval calendarization — proration of a validity span across "
    "the calendar months it straddles (revenue recognition, subscription "
    "billing, occupancy): each order carries a deterministic fulfillment "
    "window [start, start + 10..99 days], explodes to the months it "
    "covers via sequence(date_trunc month .. month, 1 month), and each "
    "month row gets the exact integer day-count overlap "
    "(least(end, month_end) - greatest(start, month_start) + 1). The "
    "explode fan-out is bounded by span/28 + 1 <= 5 rows per interval — "
    "a narrow map, no join — followed by one partial-aggregated shuffle "
    "on the month. Calendar arithmetic (date_trunc / last_day / date "
    "comparison) is integer-exact in both engines; no timestamps or "
    "timezones enter (dates only), so results are bit-identical. At "
    "100 TB this is the standard scan-shaped allocation pass; months "
    "are low-cardinality so the final aggregate is map-side combined "
    "into a handful of groups.",
    tags=("timeseries", "scalar"),
)
def q_calendarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("d0")
    )
    spans = o.select(
        "o_orderkey",
        "d0",
        F.date_add(F.col("d0"), F.expr(_CAL_SPAN_SQL).cast("int")).alias("d1"),
    )
    exploded = spans.select(
        "o_orderkey",
        "d0",
        "d1",
        F.explode(
            F.sequence(
                F.date_trunc("month", F.col("d0")).cast("date"),
                F.date_trunc("month", F.col("d1")).cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("month_start"),
    )
    overlap = (
        F.datediff(
            F.least(F.col("d1"), F.last_day("month_start")),
            F.greatest(F.col("d0"), F.col("month_start")),
        )
        + 1
    )
    return (
        exploded.groupBy("month_start")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum(overlap.cast("bigint")).alias("covered_days"),
        )
        .orderBy("month_start")
        # yyyy-MM-dd string keeps the driver's dtype-sensitive hash stable
        # (DuckDB DATE -> pandas object vs Spark DATE -> datetime64).
        .withColumn("month_start", F.date_format("month_start", "yyyy-MM-dd"))
    )


# --- capped running sum (Lindley transform) ---------------------------------

#: events deposit (+) or draw down (-) an account in integer cents;
#: purchases and errors debit, everything else credits. Deterministic sign
#: rule so the oracle replays the same ledger.
_LEDGER_DELTA_SQL = (
    "CASE WHEN event_type IN ('purchase', 'error') THEN -1 ELSE 1 END * "
    "CAST(CAST(value * 100 AS DECIMAL(38,0)) AS BIGINT)"
)


@register(
    "q_capped_runsum",
    oracle=f"""
    WITH ledger AS (
        SELECT user_id, event_id,
               {_LEDGER_DELTA_SQL} AS delta
        FROM events
    ), pref AS (
        SELECT user_id, event_id,
               SUM(delta) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        FROM ledger
    ), bal AS (
        SELECT user_id,
               s - LEAST(MIN(s) OVER (PARTITION BY user_id ORDER BY event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                         0) AS balance
        FROM pref
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)   AS n_events,
           CAST(MAX(balance) AS BIGINT) AS peak_balance_cents,
           CAST(SUM(CASE WHEN balance = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_floored
    FROM bal
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Floor-clamped running balance (stock ledger / wallet semantics): "
    "b_i = max(0, b_{i-1} + delta_i) looks like an inherently sequential "
    "per-key recursion — the shape that tempts a per-group Python loop — "
    "but the Lindley recursion has the closed form b_i = S_i - min(0, "
    "min_{j<=i} S_j) over plain prefix sums, so it is TWO stacked window "
    "functions (running sum, then running min of that sum) in pure JVM "
    "codegen: one shuffle on the key, one sort, no Python, no recursion. "
    "Deltas are exact integer cents with a deterministic sign rule "
    "(purchases/errors debit), ordered by the unique event id; the "
    "half-up double->cents rounding goes through DECIMAL(38,0) in both "
    "engines. Output is per-user final-state stats: event count, peak "
    "balance, and how many times the floor clamped. At 100 TB this is "
    "the same cost as any per-key window — and the closed form is what "
    "makes the op distributable at all.",
    tags=("timeseries", "window"),
)
def q_capped_runsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ledger = ev.select("user_id", "event_id", F.expr(_LEDGER_DELTA_SQL).alias("delta"))
    # both windows share (key, order), so Catalyst evaluates them in ONE
    # shuffle + ONE sort: the running sum, then the running min of it.
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pref = ledger.select("user_id", "event_id", F.sum("delta").over(w).alias("s"))
    bal = pref.select(
        "user_id",
        (F.col("s") - F.least(F.min("s").over(w), F.lit(0))).alias("balance"),
    )
    return (
        bal.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("balance").alias("peak_balance_cents"),
            F.sum(F.when(F.col("balance") == 0, 1).otherwise(0)).alias("n_floored"),
        )
        .orderBy("user_id")
    )
