"""Event-analytics operators over the events table: funnel conversion and
per-user activity rates. Complements the window queries in
``streaming_queries.py`` with the join-back shapes funnels need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.io import NS_PER_SECOND, load
from sales_data_pipeline_gcp_spark.plans.registry import register


@register(
    "q_funnel",
    oracle=f"""
    WITH first_view AS (
        SELECT user_id, MIN(epoch_ns(ts)) AS v_ns
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), first_purchase_after AS (
        SELECT e.user_id, MIN(epoch_ns(e.ts)) AS p_ns
        FROM events e JOIN first_view f
          ON e.user_id = f.user_id AND epoch_ns(e.ts) >= f.v_ns
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    )
    SELECT f.user_id,
           f.v_ns // {NS_PER_SECOND} AS first_view_sec,
           p.p_ns // {NS_PER_SECOND} AS first_purchase_sec,
           p.p_ns IS NOT NULL        AS converted,
           (p.p_ns - f.v_ns) // {NS_PER_SECOND} AS secs_to_convert
    FROM first_view f LEFT JOIN first_purchase_after p ON f.user_id = p.user_id
    """,
    doc="Two-step funnel (view -> purchase): first view per user, then the "
    "first purchase at-or-after it, conversion flag and latency. Both steps "
    "are aggregate-then-join — each shuffles one row per user, never the "
    "event stream twice.",
    tags=("events",),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ns"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", F.col("ts").alias("p_ts"))
    first_purchase = (
        purchases.join(first_view, "user_id")
        .filter(F.col("p_ts") >= F.col("v_ns"))
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("p_ns"))
    )
    return (
        first_view.join(first_purchase, "user_id", "left")
        .select(
            "user_id",
            F.expr(f"v_ns div {NS_PER_SECOND}").alias("first_view_sec"),
            F.expr(f"p_ns div {NS_PER_SECOND}").alias("first_purchase_sec"),
            F.col("p_ns").isNotNull().alias("converted"),
            F.expr(f"(p_ns - v_ns) div {NS_PER_SECOND}").alias("secs_to_convert"),
        )
    )


SESSION_GAP_SEC = 86_400


@register(
    "q_sessionize",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, value,
               epoch_ns(ts) // {NS_PER_SECOND} AS sec
        FROM events
    ), flagged AS (
        SELECT user_id, event_id, value, sec,
               CASE WHEN sec - LAG(sec) OVER w > {SESSION_GAP_SEC}
                    OR LAG(sec) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ), numbered AS (
        SELECT user_id, event_id, value, sec,
               SUM(is_start) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*)        AS n_events,
           MIN(sec)        AS start_sec,
           MAX(sec)        AS end_sec,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc=f"Batch sessionization (gap > {SESSION_GAP_SEC}s starts a new "
    "session): lag-flag + running-sum assigns session ids, then per-session "
    "rollup — the batch twin of q_stream_session's event-time session "
    "windows. Window order is value-deterministic ((sec, event_id) with "
    "unique event_id), so session numbering is identical cross-engine. One "
    "shuffle on user_id serves both windows AND the final group-by.",
    tags=("events", "window"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from sales_data_pipeline_gcp_spark.functions.exact import exact_sum

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.expr(f"ts div {NS_PER_SECOND}").alias("sec")
    )
    w = W.partitionBy("user_id").orderBy("sec", "event_id")
    lag_sec = F.lag("sec").over(w)
    is_start = F.when(lag_sec.isNull() | ((F.col("sec") - lag_sec) > SESSION_GAP_SEC), 1).otherwise(0)
    numbered = ev.withColumn("is_start", is_start).withColumn(
        "session_id", F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    return numbered.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count("*").alias("n_events"),
        F.min("sec").alias("start_sec"),
        F.max("sec").alias("end_sec"),
        exact_sum("value", 2).alias("sum_value"),
    )


@register(
    "q_event_rates",
    oracle=f"""
    SELECT user_id,
           epoch_ns(ts) // {NS_PER_SECOND * 86400} AS day_bucket,
           COUNT(*)                                AS n_events,
           COUNT(DISTINCT event_type)              AS n_types,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Per-user daily activity: events, distinct types, exact value sum "
    "per (user, day) — the classic engagement rollup.",
    tags=("events",),
)
def q_event_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sales_data_pipeline_gcp_spark.functions.exact import exact_sum

    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.expr(f"ts div {NS_PER_SECOND * 86400}").alias("day_bucket"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            exact_sum("value", 2).alias("sum_value"),
        )
    )


_NS_PER_DAY = NS_PER_SECOND * 86400


@register(
    "q_events_retention",
    oracle=f"""
    WITH activity AS (
        SELECT DISTINCT user_id, epoch_ns(ts) // {_NS_PER_DAY} AS day
        FROM events
    ),
    cohorts AS (
        SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
    )
    SELECT c.cohort_day,
           a.day - c.cohort_day AS day_offset,
           COUNT(*) AS active_users
    FROM activity a
    JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY c.cohort_day, a.day - c.cohort_day
    ORDER BY cohort_day, day_offset
    """,
    doc="Cohort retention matrix — the canonical product-analytics query: "
    "users grouped by first-active day, counted on each subsequent "
    "day-offset. The per-user-day distinct collapses the event stream "
    "FIRST, so the cohort join and final count run on |users x days|, "
    "not |events| — and because activity is distinct per (user, day), "
    "the final tally is a plain COUNT(*), never a second "
    "COUNT(DISTINCT) expand (measured 4.3 -> 0.7 s at sf0.1). Day "
    "arithmetic on integer epoch-ns — no tz, no calendar ambiguity, "
    "identical cross-engine.",
    tags=("events",),
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.expr(f"ts div {_NS_PER_DAY}").alias("day")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohorts, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count("*").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "q_window_rolling_days",
    oracle=f"""
    WITH daily AS (
        SELECT user_id,
               epoch_ns(ts) // {_NS_PER_DAY} AS day,
               COUNT(*) AS n_events,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) AS day_value
        FROM events
        GROUP BY user_id, epoch_ns(ts) // {_NS_PER_DAY}
    )
    SELECT user_id, day, n_events, day_value,
           CAST(SUM(n_events) OVER (
               PARTITION BY user_id ORDER BY day
               RANGE BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS events_3d,
           CAST(CAST(SUM(CAST(day_value AS DECIMAL(38,2))) OVER (
               PARTITION BY user_id ORDER BY day
               RANGE BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS VARCHAR) AS DOUBLE) AS value_3d
    FROM daily
    """,
    doc="Event-time rolling aggregate (the trailing-N-days metric): daily "
    "per-user rollup first (map-side combined — the window then runs over "
    "|user x day| rows, never raw events), then a RANGE frame over the "
    "integer day key so GAPS in activity are handled correctly — a ROWS "
    "frame would silently span missing days. Rolling sums accumulate "
    "decimal-exact inside the frame, so parallel evaluation matches the "
    "oracle bit-for-bit. One shuffle for the rollup, one for the window, "
    "both keyed on user_id.",
    tags=("events", "window"),
)
def q_window_rolling_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from sales_data_pipeline_gcp_spark.functions.exact import dec, exact_sum

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select("user_id", F.expr(f"ts div {_NS_PER_DAY}").alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value", 2).alias("day_value"),
        )
    )
    w = W.partitionBy("user_id").orderBy("day").rangeBetween(-2, 0)
    return daily.select(
        "user_id",
        "day",
        "n_events",
        "day_value",
        F.sum("n_events").over(w).alias("events_3d"),
        F.sum(dec(F.col("day_value"), 2)).over(w).cast("string").cast("double").alias("value_3d"),
    )


@register(
    "q_timeseries_gapfill",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               epoch_ns(ts) // {_NS_PER_DAY} AS day,
               COUNT(*) AS n_events,
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
    )
    SELECT g.event_type, g.day,
           COALESCE(d.n_events, 0) AS n_events,
           d.day_mean,
           LAST_VALUE(d.day_mean IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS ffill_mean
    FROM grid g LEFT JOIN daily d
      ON g.event_type = d.event_type AND g.day = d.day
    """,
    doc="Time-series resample + gap-fill: daily per-type rollup, a dense "
    "calendar spine materialized IN-PLAN (global min/max day -> "
    "sequence() -> explode, cross-joined with the distinct type list — "
    "both sides are broadcast scalars/handfuls, never driver-side "
    "collects), missing days zero-filled, and the last observed daily "
    "mean carried forward with last_value(ignorenulls) — the standard "
    "fill-forward for downstream charting/feature windows. The spine is "
    "|days| x |types| rows regardless of event volume, so at 100 TB the "
    "expensive side is still the one map-side-combined daily rollup; "
    "the fill is one window over the tiny dense grid.",
    tags=("events", "window"),
)
def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from sales_data_pipeline_gcp_spark.functions.exact import dec

    ev = load(spark, sf_dir, "events")
    day = F.expr(f"ts div {_NS_PER_DAY}")
    daily = (
        ev.select("event_type", day.alias("day"), "value")
        .groupBy("event_type", "day")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(dec(F.col("value"), 2)).cast("string").cast("double") / F.count("*")).alias("day_mean"),
        )
    )
    bounds = ev.agg(F.min(day).alias("dmin"), F.max(day).alias("dmax"))
    days = bounds.select(F.explode(F.sequence("dmin", "dmax")).alias("day"))
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(days))
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return (
        grid.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            "day_mean",
            F.last("day_mean", ignorenulls=True).over(w).alias("ffill_mean"),
        )
    )


@register(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
               ) AS next_type
        FROM events
    ), counts AS (
        SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY from_type) AS p
    FROM counts
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: LEAD over a TOTAL order (event time, then event_id — "
    "same-timestamp rows would otherwise make the successor "
    "engine-dependent), transition counts, and row-normalized "
    "probabilities via a partition-total window. The behavioral-model "
    "shape behind next-action prediction and session simulation. "
    "Probabilities are exact-integer counts divided once, so no decimal "
    "machinery is needed. At 100 TB: one user-keyed window shuffle "
    "builds successors (state = one row lookahead), then the matrix is "
    "|types|^2 rows — the heavy stream collapses immediately.",
    tags=("events", "window"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    counts = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    wt = W.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wt)).alias("p"),
    )


@register(
    "q_time_weighted_avg",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, value,
               epoch_ns(ts) AS t,
               LEAD(epoch_ns(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
               ) AS t_next
        FROM events
    ), held AS (
        SELECT user_id, value, t_next - t AS dt_ns
        FROM seq WHERE t_next IS NOT NULL
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(CAST(dt_ns AS DECIMAL(38,0))) AS BIGINT) AS held_ns,
           CAST(CAST(SUM(CAST(value * 100 AS DECIMAL(38,0)) * CAST(dt_ns AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
             / (1e2 * CAST(CAST(SUM(CAST(dt_ns AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)) AS twap
    FROM held
    GROUP BY user_id
    """,
    doc="Time-weighted average value per user (the TWAP / IoT "
    "sample-and-hold metric): each observation is weighted by how long "
    "it was the CURRENT value — lead() over the total (time, event_id) "
    "order gives the hold interval; the last observation of each user "
    "has no successor and is excluded, the standard open-interval "
    "convention. Value x duration products accumulate as scale-0 "
    "decimals (cents x nanoseconds stays far under 10^38), so the "
    "weighted sum is order-exact; one final double division. A plain "
    "AVG over irregular samples over-weights bursts — this is the "
    "correct aggregate for unevenly-sampled series. One window shuffle "
    "+ one grouped agg, both keyed by user.",
    tags=("events", "window"),
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from sales_data_pipeline_gcp_spark.functions.exact import dec

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "value", F.col("ts").alias("t"), F.lead("ts").over(w).alias("t_next")
    )
    held = seq.filter(F.col("t_next").isNotNull()).select(
        "user_id", "value", (F.col("t_next") - F.col("t")).alias("dt_ns")
    )
    v_c = F.col("value") * 100
    return held.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum(dec(F.col("dt_ns"), 0)).cast("bigint").alias("held_ns"),
        (
            F.sum(dec(v_c, 0) * dec(F.col("dt_ns"), 0)).cast("string").cast("double")
            / (F.lit(1e2) * F.sum(dec(F.col("dt_ns"), 0)).cast("string").cast("double"))
        ).alias("twap"),
    )


@register(
    "q_gaps_islands",
    oracle=f"""
    WITH active AS (
        SELECT DISTINCT user_id, epoch_ns(ts) // {_NS_PER_DAY} AS day
        FROM events
    ), grouped AS (
        SELECT user_id, day,
               day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                 AS island
        FROM active
    )
    SELECT user_id, MIN(day) AS start_day, MAX(day) AS end_day,
           COUNT(*) AS n_days
    FROM grouped
    GROUP BY user_id, island
    """,
    doc="Gaps-and-islands: maximal runs of CONSECUTIVE active days per "
    "user — the calendar-granular streak/churn shape (complementing "
    "q_sessionize's timestamp-gap sessions): distinct active days, the "
    "classic day-minus-row_number island key (constant within a "
    "consecutive run, strictly decreasing across gaps), then one agg "
    "per island. Distinct days make row_number's tie behavior moot — "
    "the whole pipeline is exact integers. The island key never leaves "
    "the plan (it is only a GROUP BY column), so the output is stable "
    "across engines. At 100 TB: the event stream collapses to "
    "user x day in the first map-side-combined distinct; the window "
    "and final agg share the user-keyed shuffle.",
    tags=("events", "window"),
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.expr(f"ts div {_NS_PER_DAY}").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    grouped = active.select(
        "user_id", "day", (F.col("day") - F.row_number().over(w)).alias("island")
    )
    return grouped.groupBy("user_id", "island").agg(
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
        F.count("*").alias("n_days"),
    ).drop("island")


@register(
    "q_cohort_ltv",
    oracle="""
    WITH om AS (
        SELECT o_custkey,
               year(o_orderdate) * 12 + month(o_orderdate) AS ym,
               o_totalprice
        FROM orders
    ), cohorts AS (
        SELECT o_custkey, MIN(ym) AS cohort_ym FROM om GROUP BY o_custkey
    )
    SELECT c.cohort_ym,
           o.ym - c.cohort_ym AS month_offset,
           COUNT(DISTINCT o.o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE)
             AS revenue
    FROM om o JOIN cohorts c ON o.o_custkey = c.o_custkey
    GROUP BY c.cohort_ym, o.ym - c.cohort_ym
    """,
    doc="Cohort lifetime-value matrix over ORDERS (the revenue twin of "
    "q_events_retention's activity matrix): customers grouped by "
    "first-order month, each later month-offset accumulating distinct "
    "buyers, order counts, and decimal-exact revenue. Month keys are "
    "integer year*12+month arithmetic — no date subtraction "
    "round-off, no interval types whose semantics differ across "
    "engines. The aggregate-then-join shape shuffles one row per "
    "customer for the cohort table, joins customer-keyed, and the "
    "matrix is |cohorts| x |offsets| — tiny. The LTV curve that "
    "prices acquisition spend. At 100 TB: two customer-keyed "
    "shuffles, both map-side combined.",
    tags=("events", "agg"),
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sales_data_pipeline_gcp_spark.functions.exact import exact_sum

    o = load(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym")
    om = o.select("o_custkey", ym, "o_totalprice")
    cohorts = om.groupBy("o_custkey").agg(F.min("ym").alias("cohort_ym"))
    return (
        om.join(cohorts, "o_custkey")
        .groupBy("cohort_ym", (F.col("ym") - F.col("cohort_ym")).alias("month_offset"))
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            exact_sum("o_totalprice", 2).alias("revenue"),
        )
    )


@register(
    "q_cumulative_users",
    oracle=f"""
    WITH activity AS (
        SELECT DISTINCT user_id, epoch_ns(ts) // {_NS_PER_DAY} AS day
        FROM events
    ), firsts AS (
        SELECT user_id, MIN(day) AS first_day FROM activity GROUP BY user_id
    ), new_by_day AS (
        SELECT first_day AS day, COUNT(*) AS n_new FROM firsts GROUP BY first_day
    ), active_by_day AS (
        SELECT day, COUNT(*) AS n_active FROM activity GROUP BY day
    )
    SELECT a.day,
           COALESCE(n.n_new, 0) AS n_new_users,
           a.n_active AS n_active_users,
           CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY a.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_users
    FROM active_by_day a LEFT JOIN new_by_day n ON a.day = n.day
    """,
    doc="User-growth curve: per day, newly-seen users (first-activity "
    "day), distinct active users, and the cumulative registered-user "
    "count — the DAU/total trajectory every growth dashboard opens "
    "with. The stream collapses to user x day in one distinct; firsts "
    "are a user-keyed agg; the cumulative sum is exact integers over "
    "the |days|-row series (dimension-bounded global window, same "
    "posture as q_rolling_corr). Every number is an integer until the "
    "caller divides. At 100 TB: two map-side-combined aggs, one tiny "
    "window.",
    tags=("events", "window", "agg"),
)
def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.expr(f"ts div {_NS_PER_DAY}").alias("day")
    ).distinct()
    firsts = activity.groupBy("user_id").agg(F.min("day").alias("first_day"))
    new_by_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("n_new")
    )
    active_by_day = activity.groupBy("day").agg(F.count("*").alias("n_active"))
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return (
        active_by_day.join(new_by_day, "day", "left")
        .select(
            "day",
            F.coalesce("n_new", F.lit(0)).alias("n_new_users"),
            F.col("n_active").alias("n_active_users"),
            F.sum(F.coalesce("n_new", F.lit(0))).over(w).alias("cum_users"),
        )
    )


#: Event-path mining: first K events per user, top N paths.
PATH_MAX_EVENTS = 12
PATH_TOP_N = 20


@register(
    "q_event_paths",
    oracle=f"""
    WITH paths AS (
        SELECT user_id,
               array_to_string(
                   (list(event_type ORDER BY epoch_ns(ts), event_id))
                     [1:{PATH_MAX_EVENTS}], '>') AS path
        FROM events GROUP BY user_id
    )
    SELECT path, COUNT(*) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT {PATH_TOP_N}
    """,
    doc="Behavioral path mining — the top event sequences users follow: "
    f"each user's first {PATH_MAX_EVENTS} events in (time, event_id) "
    "total order joined into a path string, then the "
    f"{PATH_TOP_N} most common paths (count-desc, path-asc total "
    "order). The per-user sequence is built by sorting the COLLECTED "
    "struct array in-row (array_sort on (ts, event_id, type) structs — "
    "deterministic under same-timestamp events), truncated to a "
    "bounded prefix so the agg buffer is O(K) per user regardless of "
    "history length — the cap is what makes the shape safe at 100 TB, "
    "where per-user event counts are unbounded. One user-keyed "
    "shuffle, one path-keyed shuffle, TakeOrderedAndProject for the "
    "top-N (never a global sort).",
    tags=("events", "agg"),
)
def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    sorted_types = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
        lambda s: s["event_type"],
    )
    paths = ev.groupBy("user_id").agg(
        F.array_join(F.slice(sorted_types, 1, PATH_MAX_EVENTS), ">").alias("path")
    )
    counted = paths.groupBy("path").agg(F.count("*").alias("n_users"))
    return counted.orderBy(F.col("n_users").desc(), F.col("path").asc()).limit(
        PATH_TOP_N
    )


#: Rolling-distinct window in days (trailing, inclusive).
ROLLING_DISTINCT_DAYS = 7


@register(
    "q_rolling_distinct_users",
    oracle=f"""
    WITH activity AS (
        SELECT DISTINCT user_id, epoch_ns(ts) // {_NS_PER_DAY} AS day
        FROM events
    ), bounds AS (SELECT MAX(day) AS dmax FROM activity),
    covered AS (
        SELECT a.user_id, t.report_day
        FROM activity a, bounds b,
             UNNEST(generate_series(a.day,
                                    LEAST(a.day + {ROLLING_DISTINCT_DAYS - 1},
                                          b.dmax))) AS t(report_day)
    )
    SELECT report_day AS day,
           COUNT(DISTINCT user_id) AS n_users_7d
    FROM covered
    GROUP BY report_day
    """,
    doc="Trailing 7-day distinct active users per day (the rolling-MAU "
    "family): COUNT(DISTINCT) is not window-decomposable, so the "
    "standard distributed shape is BOUNDED REPLICATION — each "
    "(user, day) activity row is exploded to the <= 7 report days it "
    "covers (clipped at the series end), then one distinct count per "
    "report day. Replication factor = window/granularity = 7, fixed "
    "and small; the activity table it replicates is already collapsed "
    "to user x day. This trades a 7x narrow map against the "
    "unbounded state a naive per-day set union would carry — the "
    "textbook sliding-distinct plan at warehouse scale. All integers; "
    "the clip bound (global max day) is a broadcast scalar.",
    tags=("events", "agg", "window"),
)
def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.expr(f"ts div {_NS_PER_DAY}").alias("day")
    ).distinct()
    bounds = activity.agg(F.max("day").alias("dmax"))
    covered = (
        activity.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.least(
                        F.col("day") + (ROLLING_DISTINCT_DAYS - 1), F.col("dmax")
                    ),
                )
            ).alias("day"),
        )
    )
    return covered.groupBy("day").agg(
        F.count_distinct("user_id").alias("n_users_7d")
    )


@register(
    "q_funnel_steps",
    oracle=f"""
    WITH v AS (
        SELECT user_id, MIN(epoch_ns(ts)) AS v_ns
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(epoch_ns(e.ts)) AS c_ns
        FROM events e JOIN v ON e.user_id = v.user_id AND epoch_ns(e.ts) >= v.v_ns
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(epoch_ns(e.ts)) AS p_ns
        FROM events e JOIN c ON e.user_id = c.user_id AND epoch_ns(e.ts) >= c.c_ns
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), wide AS (
        SELECT v.user_id, v.v_ns, c.c_ns, p.p_ns
        FROM v LEFT JOIN c ON v.user_id = c.user_id
               LEFT JOIN p ON v.user_id = p.user_id
    ), sums AS (
        SELECT COUNT(v_ns) AS n1, COUNT(c_ns) AS n2, COUNT(p_ns) AS n3,
               SUM((c_ns - v_ns) // {NS_PER_SECOND}) AS s2,
               SUM((p_ns - v_ns) // {NS_PER_SECOND}) AS s3
        FROM wide
    )
    SELECT 1 AS step, 'view' AS event_type, CAST(n1 AS BIGINT) AS n_users,
           1.0 AS conv_from_prev, 1.0 AS conv_from_start,
           0.0 AS avg_secs_from_start
    FROM sums
    UNION ALL
    SELECT 2, 'click', CAST(n2 AS BIGINT),
           CAST(n2 AS DOUBLE) / NULLIF(n1, 0), CAST(n2 AS DOUBLE) / NULLIF(n1, 0),
           CAST(s2 AS DOUBLE) / NULLIF(n2, 0)
    FROM sums
    UNION ALL
    SELECT 3, 'purchase', CAST(n3 AS BIGINT),
           CAST(n3 AS DOUBLE) / NULLIF(n2, 0), CAST(n3 AS DOUBLE) / NULLIF(n1, 0),
           CAST(s3 AS DOUBLE) / NULLIF(n3, 0)
    FROM sums
    """,
    doc="Three-step strict-sequence funnel (view -> click at-or-after the "
    "first view -> purchase at-or-after the first click): per-step user "
    "counts, step-over-step and from-start conversion rates, and mean "
    "seconds from funnel entry — the k-step generalization of q_funnel's "
    "cascading first-event pattern. Each step is aggregate-then-join: one "
    "row per user shuffles per step, never the event stream twice. "
    "Latency sums accumulate integer SECONDS (nanosecond sums would "
    "overflow int64 at ~1e5 users x 90 days). At 100 TB: k user-keyed "
    "one-row-per-user joins that AQE keeps shuffle-free after the first "
    "exchange (same key), and a single-row summary — the per-user wide "
    "funnel table stays distributed.",
    tags=("events", "agg"),
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ns"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ns"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ns"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c_ns"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ns"))
    )
    wide = v.join(c, "user_id", "left").join(p, "user_id", "left")
    sums = wide.agg(
        F.count("v_ns").alias("n1"),
        F.count("c_ns").alias("n2"),
        F.count("p_ns").alias("n3"),
        F.sum(F.expr(f"(c_ns - v_ns) div {NS_PER_SECOND}")).alias("s2"),
        F.sum(F.expr(f"(p_ns - v_ns) div {NS_PER_SECOND}")).alias("s3"),
    )
    step1 = sums.select(
        F.lit(1).alias("step"),
        F.lit("view").alias("event_type"),
        F.col("n1").cast("bigint").alias("n_users"),
        F.lit(1.0).alias("conv_from_prev"),
        F.lit(1.0).alias("conv_from_start"),
        F.lit(0.0).alias("avg_secs_from_start"),
    )
    step2 = sums.select(
        F.lit(2).alias("step"),
        F.lit("click").alias("event_type"),
        F.col("n2").cast("bigint").alias("n_users"),
        # NULL on an empty upstream step, matching the oracle's NULLIF —
        # DuckDB emits IEEE inf/nan on a bare /0, a cross-engine mismatch.
        F.when(F.col("n1") != 0, F.col("n2").cast("double") / F.col("n1")).alias(
            "conv_from_prev"
        ),
        F.when(F.col("n1") != 0, F.col("n2").cast("double") / F.col("n1")).alias(
            "conv_from_start"
        ),
        F.when(F.col("n2") != 0, F.col("s2").cast("double") / F.col("n2")).alias(
            "avg_secs_from_start"
        ),
    )
    step3 = sums.select(
        F.lit(3).alias("step"),
        F.lit("purchase").alias("event_type"),
        F.col("n3").cast("bigint").alias("n_users"),
        F.when(F.col("n2") != 0, F.col("n3").cast("double") / F.col("n2")).alias(
            "conv_from_prev"
        ),
        F.when(F.col("n1") != 0, F.col("n3").cast("double") / F.col("n1")).alias(
            "conv_from_start"
        ),
        F.when(F.col("n3") != 0, F.col("s3").cast("double") / F.col("n3")).alias(
            "avg_secs_from_start"
        ),
    )
    return step1.unionByName(step2).unionByName(step3)


@register(
    "q_peak_concurrency",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, epoch_ns(ts) // {NS_PER_SECOND} AS sec FROM events
    ), flagged AS (
        SELECT user_id, sec,
               CASE WHEN sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY sec)
                         > {SESSION_GAP_SEC} THEN 1 ELSE 0 END AS new_s
        FROM ev
    ), numbered AS (
        SELECT user_id, sec,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY sec) AS sid
        FROM flagged
    ), sessions AS (
        SELECT user_id, sid, MIN(sec) AS s_start, MAX(sec) AS s_end
        FROM numbered GROUP BY user_id, sid
    ), deltas AS (
        SELECT s_start AS t, 1 AS d FROM sessions
        UNION ALL
        SELECT s_end + 1 AS t, -1 AS d FROM sessions
    ), cum AS (
        -- at equal instants the -1s apply FIRST (ORDER BY t, d ASC), so
        -- back-to-back sessions never double-count
        SELECT t, SUM(d) OVER (ORDER BY t, d
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM deltas
    ), stats AS (
        SELECT MAX(c) AS peak FROM cum
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sessions)      AS n_sessions,
           CAST(peak AS BIGINT)                                 AS peak_concurrency,
           (SELECT CAST(MIN(t) AS BIGINT) FROM cum, stats
            WHERE c = peak)                                     AS first_peak_sec,
           (SELECT CAST(SUM(s_end - s_start) AS DOUBLE) / COUNT(*)
            FROM sessions)                                      AS avg_session_secs
    FROM stats
    """,
    doc="Peak session concurrency (interval stabbing): sessionize each "
    "user's events with the standard gap rule, convert every session "
    "interval to a +1/-1 delta pair, and take the running sum over a "
    "total (time, delta) order — max is the peak number of simultaneous "
    "sessions, with the earliest instant it was reached; the capacity-"
    "planning number a gaps-and-islands run-length analysis cannot give "
    "(overlap ACROSS users is the whole point). At equal instants the "
    "-1 applies first, so back-to-back sessions never double-count; tied "
    "deltas permute freely without changing the prefix-sum multiset, so "
    "the peak and its earliest time are deterministic. All integer "
    "seconds. At 100 TB: the event stream collapses to one row per "
    "SESSION before the global window; the documented swap for extreme "
    "session counts is the two-pass range-partitioned cumulative sum "
    "(per-partition totals broadcast as offsets) — same lever as "
    "q_cumulative_users.",
    tags=("events", "window", "analytics"),
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr(f"ts div {NS_PER_SECOND}").alias("sec")
    )
    w_u = W.partitionBy("user_id").orderBy("sec")
    flagged = ev.select(
        "user_id",
        "sec",
        F.when(F.col("sec") - F.lag("sec").over(w_u) > SESSION_GAP_SEC, 1)
        .otherwise(0)
        .alias("new_s"),
    )
    numbered = flagged.select(
        "user_id",
        "sec",
        F.sum("new_s").over(w_u.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("sid"),
    )
    sessions = numbered.groupBy("user_id", "sid").agg(
        F.min("sec").alias("s_start"), F.max("sec").alias("s_end")
    )
    deltas = sessions.select(F.col("s_start").alias("t"), F.lit(1).alias("d")).unionByName(
        sessions.select((F.col("s_end") + 1).alias("t"), F.lit(-1).alias("d"))
    )
    w_cum = W.orderBy("t", "d").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = deltas.select("t", F.sum("d").over(w_cum).alias("c"))
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    peaks = cum.withColumn("peak", F.max("c").over(w_all))
    peak_row = peaks.filter(F.col("c") == F.col("peak")).groupBy("peak").agg(
        F.min("t").cast("bigint").alias("first_peak_sec")
    )
    sess_stats = sessions.agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        (
            F.sum(F.col("s_end") - F.col("s_start")).cast("double") / F.count("*")
        ).alias("avg_session_secs"),
    )
    return sess_stats.join(F.broadcast(peak_row)).select(
        "n_sessions",
        F.col("peak").cast("bigint").alias("peak_concurrency"),
        "first_peak_sec",
        "avg_session_secs",
    )
