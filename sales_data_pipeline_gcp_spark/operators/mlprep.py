"""ML-training-data preparation operators: point-in-time-correct label
generation, embargoed time-based train/valid/test splitting, categorical
distribution drift (total-variation distance), and exact rolling medians.

Reference parity: the reference ends at a cleaned fact table
(scripts/process_sales.py:64-69); these are the operators that turn such a
table into supervised training data without leakage — the core discipline
of a feature store (labels may only look forward, features only backward,
and evaluation rows near a split boundary are purged).

Exactness discipline (SURVEY.md §7): all statistics are rational in
integer nanoseconds / counts / cents — no transcendentals; the only
doubles are final single divisions computed identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.functions.exact import dec
from sales_data_pipeline_gcp_spark.functions.hashing import shared_hash, sql_shared_hash
from sales_data_pipeline_gcp_spark.io import NS_PER_SECOND, load
from sales_data_pipeline_gcp_spark.plans.registry import register

_NS_PER_DAY = NS_PER_SECOND * 86400

#: Label look-forward horizon: a view converts if the same user purchases
#: within this many days after (inclusive window end).
LABEL_HORIZON_DAYS = 7


@register(
    "q_label_window",
    oracle=f"""
    WITH nxt AS (
        SELECT event_type, epoch_ns(ts) AS tns,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END)
                   OVER (PARTITION BY user_id
                         ORDER BY epoch_ns(ts), event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_purchase_ns
        FROM events
    ), labeled AS (
        SELECT tns // {_NS_PER_DAY} AS day,
               CASE WHEN next_purchase_ns IS NOT NULL
                     AND next_purchase_ns - tns <= {LABEL_HORIZON_DAYS} * {_NS_PER_DAY}
                    THEN 1 ELSE 0 END AS label
        FROM nxt WHERE event_type = 'view'
    )
    SELECT CAST(day AS BIGINT)        AS day,
           COUNT(*)                   AS n_views,
           CAST(SUM(label) AS BIGINT) AS n_pos,
           CAST(SUM(label) AS DOUBLE) / COUNT(*) AS pos_rate
    FROM labeled
    GROUP BY day
    """,
    doc=f"Point-in-time-correct label generation: each 'view' event gets a "
    f"binary label — did the same user purchase within {LABEL_HORIZON_DAYS} "
    "days AFTER the view — computed with a strictly-forward window (MIN of "
    "purchase timestamps over ROWS 1 FOLLOWING..UNBOUNDED in the user's "
    "(ts, event_id) order), so a label can never leak the feature row "
    "itself or anything before it; reported as per-day label prevalence, "
    "the class-balance curve a trainer monitors. All time arithmetic is "
    "integer nanoseconds. At 100 TB: one user-partitioned window "
    "(parallel, no global sort) then a map-side-collapsing day rollup; "
    "the per-row labeled set — the actual training input — stays "
    "distributed and is never collected.",
    tags=("ml", "events", "window"),
)
def q_label_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(1, W.unboundedFollowing)
    )
    nxt = ev.select(
        "event_type",
        F.col("ts").alias("tns"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(w).alias(
            "next_purchase_ns"
        ),
    )
    labeled = nxt.filter(F.col("event_type") == "view").select(
        F.expr(f"tns div {_NS_PER_DAY}").alias("day"),
        F.when(
            F.col("next_purchase_ns").isNotNull()
            & (F.col("next_purchase_ns") - F.col("tns") <= LABEL_HORIZON_DAYS * _NS_PER_DAY),
            1,
        )
        .otherwise(0)
        .alias("label"),
    )
    return labeled.groupBy(F.col("day").cast("bigint").alias("day")).agg(
        F.count("*").alias("n_views"),
        F.sum("label").cast("bigint").alias("n_pos"),
        (F.sum("label").cast("double") / F.count("*")).alias("pos_rate"),
    )


#: Split fractions in basis points of the observed time range, and the
#: embargo (purge) width as a fraction of the range. Integer arithmetic:
#: boundary = tmin + bp * range // 10000.
SPLIT_TRAIN_BP = 7000
SPLIT_VALID_BP = 8500
EMBARGO_BP = 200


@register(
    "q_train_test_split",
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(epoch_ns(ts)) AS tmin, MAX(epoch_ns(ts)) AS tmax FROM events
    ), marked AS (
        -- divide the range BEFORE multiplying by basis points: bp * range
        -- overflows int64 at nanosecond resolution (range ~8e18 ns)
        SELECT user_id, epoch_ns(ts) AS tns,
               tmin + {SPLIT_TRAIN_BP} * ((tmax - tmin) // 10000) AS t1,
               tmin + {SPLIT_VALID_BP} * ((tmax - tmin) // 10000) AS t2,
               {EMBARGO_BP} * ((tmax - tmin) // 10000)             AS e
        FROM events, bounds
    ), tagged AS (
        SELECT user_id, tns,
               CASE WHEN tns <  t1 - e THEN 'train'
                    WHEN tns <  t1     THEN 'purged'
                    WHEN tns <  t2 - e THEN 'valid'
                    WHEN tns <  t2     THEN 'purged'
                    ELSE 'test' END AS split
        FROM marked
    )
    SELECT split,
           COUNT(*)                       AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(tns // {_NS_PER_DAY}) AS BIGINT) AS min_day,
           CAST(MAX(tns // {_NS_PER_DAY}) AS BIGINT) AS max_day
    FROM tagged
    GROUP BY split
    """,
    doc="Embargoed time-based train/valid/test split: boundaries at 70% / "
    "85% of the observed time range (integer-nanosecond basis-point "
    "arithmetic — no float date math), with a 2%-of-range PURGE band "
    "before each boundary whose rows join neither side — the leakage "
    "guard that keeps trailing-window features of early valid rows from "
    "overlapping train targets (the purged-CV discipline). Output is the "
    "per-split audit: event/user counts and day extents, where "
    "min_day(valid) > max_day(train) proves the gap. At 100 TB: the "
    "bounds row broadcasts (replication factor 1); tagging is a narrow "
    "map and the audit collapses map-side — the tagged set itself stays "
    "distributed for downstream writers.",
    tags=("ml", "events", "agg"),
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(F.min("ts").alias("tmin"), F.max("ts").alias("tmax"))
    marked = ev.join(F.broadcast(bounds)).select(
        "user_id",
        F.col("ts").alias("tns"),
        # divide the range BEFORE multiplying by basis points: bp * range
        # overflows int64 at nanosecond resolution (range ~8e18 ns)
        (
            F.col("tmin")
            + F.expr(f"{SPLIT_TRAIN_BP} * ((tmax - tmin) div 10000)")
        ).alias("t1"),
        (
            F.col("tmin")
            + F.expr(f"{SPLIT_VALID_BP} * ((tmax - tmin) div 10000)")
        ).alias("t2"),
        F.expr(f"{EMBARGO_BP} * ((tmax - tmin) div 10000)").alias("e"),
    )
    tagged = marked.select(
        "user_id",
        "tns",
        F.when(F.col("tns") < F.col("t1") - F.col("e"), "train")
        .when(F.col("tns") < F.col("t1"), "purged")
        .when(F.col("tns") < F.col("t2") - F.col("e"), "valid")
        .when(F.col("tns") < F.col("t2"), "purged")
        .otherwise("test")
        .alias("split"),
    )
    return tagged.groupBy("split").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.min(F.expr(f"tns div {_NS_PER_DAY}")).cast("bigint").alias("min_day"),
        F.max(F.expr(f"tns div {_NS_PER_DAY}")).cast("bigint").alias("max_day"),
    )


@register(
    "q_tv_drift",
    oracle="""
    WITH bounds AS (
        SELECT MIN(epoch_ns(ts)) AS tmin,
               MIN(epoch_ns(ts)) + (MAX(epoch_ns(ts)) - MIN(epoch_ns(ts))) // 2 AS mid
        FROM events
    ), per_type AS (
        SELECT event_type,
               COUNT(*) FILTER (WHERE epoch_ns(ts) <  mid) AS ca,
               COUNT(*) FILTER (WHERE epoch_ns(ts) >= mid) AS cb
        FROM events, bounds
        GROUP BY event_type
    ), tot AS (
        SELECT event_type, ca, cb,
               SUM(ca) OVER () AS na,
               SUM(cb) OVER () AS nb,
               ABS(ca * SUM(cb) OVER () - cb * SUM(ca) OVER ()) AS num
        FROM per_type
    )
    SELECT CAST(na AS BIGINT) AS n_before,
           CAST(nb AS BIGINT) AS n_after,
           CAST(SUM(num) AS DOUBLE)
             / (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS tv_stat,
           MIN(CASE WHEN num = (SELECT MAX(num) FROM tot) THEN event_type END)
               AS top_type
    FROM tot
    GROUP BY na, nb
    """,
    doc="Categorical distribution drift via total-variation distance: split "
    "the event stream at the temporal midpoint and compute "
    "TV = 0.5 * SUM |p_t - q_t| between the before/after event-type "
    "mixes — the categorical counterpart of q_ks_test (and the "
    "log-free alternative to PSI/KL, which are not bit-reproducible "
    "cross-engine). Each deviation is held as the integer cross-product "
    "|ca*nb - cb*na|; one final division normalizes. Also reports the "
    "most-drifting type (alphabetical on ties). At 100 TB: single-row "
    "bounds broadcast, map-side-collapsing conditional counts to |types| "
    "rows — the windows and final agg run on a handful of rows.",
    tags=("ml", "stats", "events"),
)
def q_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min("ts").alias("tmin"),
        (F.min("ts") + F.expr("(max(ts) - min(ts)) div 2")).alias("mid"),
    )
    per_type = (
        ev.join(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("ts") < F.col("mid"), 1)).alias("ca"),
            F.count(F.when(F.col("ts") >= F.col("mid"), 1)).alias("cb"),
        )
    )
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    tot = per_type.select(
        "event_type",
        "ca",
        "cb",
        F.sum("ca").over(w_all).alias("na"),
        F.sum("cb").over(w_all).alias("nb"),
        F.abs(
            F.col("ca") * F.sum("cb").over(w_all) - F.col("cb") * F.sum("ca").over(w_all)
        ).alias("num"),
    ).withColumn("num_max", F.max("num").over(w_all))
    return tot.groupBy("na", "nb").agg(
        (
            F.sum("num").cast("double")
            / (F.lit(2.0) * F.col("na").cast("double") * F.col("nb").cast("double"))
        ).alias("tv_stat"),
        F.min(F.when(F.col("num") == F.col("num_max"), F.col("event_type"))).alias("top_type"),
    ).select(
        F.col("na").cast("bigint").alias("n_before"),
        F.col("nb").cast("bigint").alias("n_after"),
        "tv_stat",
        "top_type",
    )


#: Rolling-median lookback in trading periods; odd, so the median is an
#: exact element of the window — no midpoint averaging, no float.
MEDIAN_WINDOW = 7


@register(
    "q_window_median",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT) AS rev_c
        FROM orders GROUP BY o_orderdate
    ), rolled AS (
        SELECT d, rev_c,
               COUNT(*) OVER w AS n_w,
               CAST(QUANTILE_DISC(rev_c, 0.5) OVER w AS BIGINT) AS med_c
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN {MEDIAN_WINDOW - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT d,
           CAST(rev_c AS DOUBLE) / 1e2 AS revenue,
           CAST(med_c AS DOUBLE) / 1e2 AS median7
    FROM rolled
    WHERE n_w = {MEDIAN_WINDOW}
    """,
    doc=f"Exact rolling median of daily revenue over a {MEDIAN_WINDOW}-day "
    "ROWS frame — the robust trend line a mean-based moving average "
    "can't give (one outlier day shifts the mean, not the median). The "
    f"window length is odd, so the median is literally the "
    f"{MEDIAN_WINDOW // 2 + 1}th smallest element of the frame: Spark "
    "takes element_at(sort_array(collect_list(cents)), k) — exact "
    "integer order statistics, no interpolation, no float — matching "
    "DuckDB's discrete QUANTILE_DISC window. Warm-up rows are excluded "
    "structurally. At 100 TB: the scan collapses map-side to one row "
    "per day before the single tiny ordered window; the collect_list "
    f"buffer is bounded at {MEDIAN_WINDOW} elements per row by the "
    "frame, never by data volume.",
    tags=("stats", "window", "timeseries"),
)
def q_window_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(dec(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("rev_c")
    )
    w = W.orderBy("d").rowsBetween(-(MEDIAN_WINDOW - 1), W.currentRow)
    rolled = daily.select(
        "d",
        "rev_c",
        F.count("*").over(w).alias("n_w"),
        F.element_at(
            F.sort_array(F.collect_list("rev_c").over(w)), MEDIAN_WINDOW // 2 + 1
        ).alias("med_c"),
    )
    return rolled.filter(F.col("n_w") == MEDIAN_WINDOW).select(
        "d",
        (F.col("rev_c").cast("double") / F.lit(1e2)).alias("revenue"),
        (F.col("med_c").cast("double") / F.lit(1e2)).alias("median7"),
    )


#: Feature-hashing dimensionality (the "hashing trick" bucket count) and
#: the modulus that coarsens the numeric prop value into a categorical.
FEATURE_BUCKETS = 8
PROP_MOD = 4

_FEATURE_COLS_SQL = ",\n           ".join(
    f"COUNT(*) FILTER (WHERE bucket = {i}) AS f{i}" for i in range(FEATURE_BUCKETS)
)


@register(
    "q_feature_hash",
    oracle=f"""
    WITH toks AS (
        SELECT user_id, 't:' || event_type AS tok FROM events
        UNION ALL
        SELECT user_id,
               'k:' || CAST(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)
                            % {PROP_MOD} AS VARCHAR)
        FROM events
        WHERE JSON_EXTRACT_STRING(props, '$.k') IS NOT NULL
    ), b AS (
        SELECT user_id, {sql_shared_hash("tok", "fh:")} % {FEATURE_BUCKETS} AS bucket
        FROM toks
    )
    SELECT user_id,
           COUNT(*) AS n_tokens,
           {_FEATURE_COLS_SQL}
    FROM b GROUP BY user_id
    """,
    doc=f"Feature hashing (the hashing trick): every event contributes a "
    "categorical token for its type and a coarsened token for its numeric "
    f"prop (k mod {PROP_MOD}); tokens hash into {FEATURE_BUCKETS} fixed "
    "buckets via the cross-engine shared md5 hash and per-user bucket "
    "counts become the dense f0..f7 feature vector — the "
    "collision-tolerant categorical encoder that needs NO vocabulary "
    "build, NO dictionary broadcast, and has fixed output width at any "
    "cardinality (Weinberger et al.'s hashing trick). Pure integer "
    "counts. At 100 TB: a narrow token map then one user-keyed "
    "map-side-combining aggregate — no vocabulary state is the point; "
    "the hash family is pluggable (xxhash64 once the oracle leaves the "
    "loop, hashing.py scale note).",
    tags=("ml", "events", "agg"),
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k_val = F.get_json_object("props", "$.k").cast("bigint")
    t_tok = F.concat(F.lit("t:"), F.col("event_type"))
    k_tok = F.when(
        k_val.isNotNull(),
        F.concat(F.lit("k:"), (k_val % PROP_MOD).cast("string")),
    )
    toks = (
        ev.select("user_id", F.explode(F.array(t_tok, k_tok)).alias("tok"))
        .filter(F.col("tok").isNotNull())
    )
    b = toks.select("user_id", (shared_hash(F.col("tok"), "fh:") % FEATURE_BUCKETS).alias("bucket"))
    aggs = [F.count("*").alias("n_tokens")] + [
        F.count(F.when(F.col("bucket") == i, 1)).alias(f"f{i}") for i in range(FEATURE_BUCKETS)
    ]
    return b.groupBy("user_id").agg(*aggs)


#: Lift-curve deciles: users ranked by the behavioral score into this many
#: equal-frequency tiles.
LIFT_TILES = 10


@register(
    "q_lift_curve",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type IN ('view', 'click')) AS score,
               CASE WHEN COUNT(*) FILTER (WHERE event_type = 'purchase') > 0
                    THEN 1 ELSE 0 END AS label
        FROM events GROUP BY user_id
    ), tiled AS (
        SELECT score, label,
               NTILE({LIFT_TILES}) OVER (ORDER BY score DESC, user_id ASC) AS decile
        FROM per_user
    ), per_tile AS (
        SELECT decile, COUNT(*) AS n_users, SUM(label) AS n_pos
        FROM tiled GROUP BY decile
    ), tot AS (
        SELECT decile, n_users, n_pos,
               SUM(n_pos) OVER ()                   AS total_pos,
               SUM(n_users) OVER ()                 AS total_users,
               SUM(n_pos) OVER (ORDER BY decile)    AS cum_pos
        FROM per_tile
    )
    SELECT CAST(decile AS INTEGER) AS decile,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_pos AS BIGINT)   AS n_pos,
           CAST(n_pos AS DOUBLE) / n_users AS pos_rate,
           (CAST(n_pos AS DOUBLE) / n_users)
             / (CAST(total_pos AS DOUBLE) / total_users) AS lift,
           CAST(cum_pos AS DOUBLE) / total_pos AS cum_capture
    FROM tot
    """,
    doc=f"Decile lift curve — the targeting-model evaluation table: users "
    "ranked by a behavioral score (view+click volume) into "
    f"NTILE({LIFT_TILES}) tiles under a total deterministic order, then "
    "per-decile purchase rate, lift over the base rate, and cumulative "
    "capture (what fraction of all buyers the top-k deciles reach). A "
    "monotone-ish lift column is the fastest sanity check that a score "
    "ranks buyers above non-buyers; cum_capture is the campaign-budget "
    "curve. All counts integer; three final ratio divisions. At 100 TB: "
    "the event scan collapses map-side to one row per user; the global "
    "NTILE runs over |users| rows with the documented approx-cutpoint "
    "swap (q_rfm's lever) at extreme user counts.",
    tags=("ml", "events", "window"),
)
def q_lift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type").isin("view", "click"), 1)).alias("score"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("label"),
    )
    tiled = per_user.select(
        "score",
        "label",
        F.ntile(LIFT_TILES)
        .over(W.orderBy(F.col("score").desc(), F.col("user_id").asc()))
        .alias("decile"),
    )
    per_tile = tiled.groupBy("decile").agg(
        F.count("*").alias("n_users"), F.sum("label").alias("n_pos")
    )
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    w_cum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    tot = per_tile.select(
        "decile",
        "n_users",
        "n_pos",
        F.sum("n_pos").over(w_all).alias("total_pos"),
        F.sum("n_users").over(w_all).alias("total_users"),
        F.sum("n_pos").over(w_cum).alias("cum_pos"),
    )
    return tot.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        (F.col("n_pos").cast("double") / F.col("n_users")).alias("pos_rate"),
        (
            (F.col("n_pos").cast("double") / F.col("n_users"))
            / (F.col("total_pos").cast("double") / F.col("total_users"))
        ).alias("lift"),
        (F.col("cum_pos").cast("double") / F.col("total_pos")).alias("cum_capture"),
    )


#: Hampel identifier threshold in MAD units (integer comparison k*mad).
HAMPEL_K = 3


@register(
    "q_window_hampel",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS BIGINT) AS rev_c
        FROM orders GROUP BY o_orderdate
    ), rolled AS (
        SELECT d, rev_c,
               COUNT(*) OVER w AS n_w,
               list(rev_c) OVER w AS arr
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN {MEDIAN_WINDOW - 1} PRECEDING AND CURRENT ROW)
    ), med AS (
        SELECT d, rev_c, n_w, arr,
               list_sort(arr)[{MEDIAN_WINDOW // 2 + 1}] AS med_c
        FROM rolled
    ), dev AS (
        SELECT d, rev_c, n_w, med_c,
               list_sort(list_transform(arr, v -> ABS(v - med_c)))[{MEDIAN_WINDOW // 2 + 1}] AS mad_c
        FROM med
    )
    SELECT d,
           CAST(rev_c AS DOUBLE) / 1e2 AS revenue,
           CAST(med_c AS DOUBLE) / 1e2 AS med7,
           CAST(mad_c AS DOUBLE) / 1e2 AS mad7,
           CAST(CASE WHEN ABS(rev_c - med_c) > {HAMPEL_K} * mad_c
                     THEN 1 ELSE 0 END AS INTEGER) AS hampel_outlier
    FROM dev
    WHERE n_w = {MEDIAN_WINDOW}
    """,
    doc=f"Hampel filter over daily revenue: a {MEDIAN_WINDOW}-day rolling "
    f"MEDIAN and rolling MAD (median absolute deviation), flagging days "
    f"where |x - median| > {HAMPEL_K} x MAD — the robust despiking filter "
    "that, unlike q_bollinger_bands' mean/sigma, cannot be dragged by the "
    "outlier it is trying to flag (50% breakdown point vs 0%). Both "
    "order statistics are exact integer-cent elements of the sorted "
    "frame (odd window), and the flag predicate compares INTEGERS — no "
    "float enters any decision. Completes the rolling-robustness triple "
    "with q_window_median and q_outlier_mad (global MAD). At 100 TB: the "
    "scan collapses map-side to one row per day; the in-row list sort is "
    f"O({MEDIAN_WINDOW} log {MEDIAN_WINDOW}) per row with a frame-bounded "
    "buffer.",
    tags=("stats", "window", "timeseries"),
)
def q_window_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(dec(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("rev_c")
    )
    w = W.orderBy("d").rowsBetween(-(MEDIAN_WINDOW - 1), W.currentRow)
    rolled = daily.select(
        "d",
        "rev_c",
        F.count("*").over(w).alias("n_w"),
        F.collect_list("rev_c").over(w).alias("arr"),
    )
    mid = MEDIAN_WINDOW // 2 + 1
    med = rolled.withColumn("med_c", F.element_at(F.sort_array("arr"), mid))
    dev = med.withColumn(
        "mad_c",
        F.element_at(
            F.sort_array(F.transform("arr", lambda v: F.abs(v - F.col("med_c")))), mid
        ),
    )
    return dev.filter(F.col("n_w") == MEDIAN_WINDOW).select(
        "d",
        (F.col("rev_c").cast("double") / F.lit(1e2)).alias("revenue"),
        (F.col("med_c").cast("double") / F.lit(1e2)).alias("med7"),
        (F.col("mad_c").cast("double") / F.lit(1e2)).alias("mad7"),
        F.when(
            F.abs(F.col("rev_c") - F.col("med_c")) > HAMPEL_K * F.col("mad_c"), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("hampel_outlier"),
    )
