"""As-of join — an operator Spark lacks natively (SURVEY.md §2.4 custom
operators; guide "Common OLAP patterns").

Implementation is the scale-correct composition (NOT ``pd.merge_asof`` in a
grouped map, which would pull each group into Python): tag both sides, union
them, and take a running ``last(right_value, ignorenulls=True)`` over a
window ordered by (time, side). One shuffle on the join key, no Python, no
per-group memory blowup; AQE handles skewed keys.

The DuckDB oracle uses its NATIVE ``ASOF LEFT JOIN`` — the engines agree on
semantics through entirely independent implementations, which is the
strongest parity evidence in the suite.

Demo query: purchase→view attribution over the events table — for every
``purchase`` event, the most recent prior ``view`` by the same user.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.io import NS_PER_SECOND, load
from sales_data_pipeline_gcp_spark.plans.registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``on`` key: ``backward`` = greatest ``right_time <= left_time``,
    ``forward`` = smallest ``right_time >= left_time`` (NULLs when no such
    row). ``right`` must be unique per (on, right_time) — dedup first for
    determinism. ``on`` must be NON-NULL on both sides: the window
    partitionBy groups NULL keys into one partition (a NULL-key left row
    would fill from a NULL-key right row) while SQL ASOF equality never
    matches NULL — the divergence is pinned in
    tests/test_differential_fuzz.py::test_asof_null_key_domain_boundary;
    filter or coalesce nullable keys before calling.

    Both directions are the same union+running-fill composition; forward
    flips the side ordering (right rows sort AFTER left at equal times so
    ``>=`` includes them) and fills with ``first`` over the FOLLOWING frame.
    """
    backward = direction == "backward"
    l_tagged = left.withColumn("__side", F.lit(1 if backward else 0)).withColumn(
        "__t", F.col(left_time)
    )
    r_tagged = (
        right.withColumn("__side", F.lit(0 if backward else 1))
        .withColumn("__t", F.col(right_time))
        .select(on, "__side", "__t", *right_cols)
    )
    l_cols = [c for c in l_tagged.columns if c not in ("__side", "__t")]
    unioned = l_tagged.select(
        on,
        "__side",
        "__t",
        *[F.col(c) for c in l_cols if c != on],
        *[F.lit(None).cast(r_tagged.schema[c].dataType).alias(c) for c in right_cols],
    ).unionByName(
        r_tagged.select(
            on,
            "__side",
            "__t",
            *[F.lit(None).cast(l_tagged.schema[c].dataType).alias(c) for c in l_cols if c != on],
            *right_cols,
        )
    )
    ordered = W.partitionBy(on).orderBy("__t", "__side")
    if backward:
        # right rows sort before left at equal time -> `<=` inclusive
        w = ordered.rowsBetween(W.unboundedPreceding, W.currentRow)
        fill = F.last
    else:
        # left rows (side 0) sort before right at equal time -> `>=` inclusive
        w = ordered.rowsBetween(W.currentRow, W.unboundedFollowing)
        fill = F.first
    # Fill ONE struct that is non-NULL exactly on right-side rows, then
    # project its fields: per-column fills would skip past a right row for
    # any column that is legitimately NULL in it, stitching the result from
    # DIFFERENT right rows — native ASOF semantics are row-atomic.
    right_side = 0 if backward else 1
    packed = F.when(
        F.col("__side") == right_side, F.struct(*[F.col(c) for c in right_cols])
    )
    filled = unioned.select(
        "*", fill(packed, ignorenulls=True).over(w).alias("__asof")
    )
    return filled.filter(F.col("__side") == (1 if backward else 0)).select(
        *[F.col(c) for c in l_cols],
        *[F.col(f"__asof.{c}").alias(c) for c in right_cols],
    )


@register(
    "q_join_asof",
    oracle=f"""
    WITH purchases AS (
        SELECT event_id, user_id, epoch_ns(ts) AS tns
        FROM events WHERE event_type = 'purchase'
    ), views AS (
        SELECT user_id, epoch_ns(ts) AS tns, MAX(event_id) AS view_event_id
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, epoch_ns(ts)
    )
    SELECT p.event_id,
           p.user_id,
           p.tns // {NS_PER_SECOND}                          AS purchase_sec,
           v.view_event_id                                   AS attributed_view,
           (p.tns - v.tns) // {NS_PER_SECOND}                AS gap_sec
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.tns >= v.tns
    """,
    doc="As-of join (purchase -> most recent prior view per user): Spark "
    "side is the union+window composition in operators/asof.py (one "
    "shuffle, no Python); the oracle is DuckDB's NATIVE ASOF LEFT JOIN — "
    "independent implementations, same semantics.",
    tags=("join", "asof", "flagship"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("tns")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("vtns"))
        .agg(F.max("event_id").alias("view_event_id"))
        .withColumn("view_tns", F.col("vtns"))
        .drop("vtns")
    )
    joined = asof_join(
        purchases,
        views,
        on="user_id",
        left_time="tns",
        right_time="view_tns",
        right_cols=["view_event_id", "view_tns"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.expr(f"tns div {NS_PER_SECOND}").alias("purchase_sec"),
        F.col("view_event_id").alias("attributed_view"),
        F.expr(f"(tns - view_tns) div {NS_PER_SECOND}").alias("gap_sec"),
    )


@register(
    "q_join_asof_fwd",
    oracle=f"""
    WITH views AS (
        SELECT event_id, user_id, epoch_ns(ts) AS tns
        FROM events WHERE event_type = 'view'
    ), purchases AS (
        SELECT user_id, epoch_ns(ts) AS tns, MAX(event_id) AS purchase_event_id
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, epoch_ns(ts)
    )
    SELECT v.event_id,
           v.user_id,
           v.tns // {NS_PER_SECOND}                          AS view_sec,
           p.purchase_event_id                               AS next_purchase,
           (p.tns - v.tns) // {NS_PER_SECOND}                AS wait_sec
    FROM views v ASOF LEFT JOIN purchases p
      ON v.user_id = p.user_id AND v.tns <= p.tns
    """,
    doc="Forward as-of join (view -> next purchase per user, i.e. "
    "time-to-conversion): exercises asof_join(direction='forward'); the "
    "oracle is DuckDB's native ASOF LEFT JOIN with a <= ordering condition "
    "— independent implementations, same semantics.",
    tags=("join", "asof"),
)
def q_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.col("ts").alias("tns")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("ptns"))
        .agg(F.max("event_id").alias("purchase_event_id"))
        .withColumn("purchase_tns", F.col("ptns"))
        .drop("ptns")
    )
    joined = asof_join(
        views,
        purchases,
        on="user_id",
        left_time="tns",
        right_time="purchase_tns",
        right_cols=["purchase_event_id", "purchase_tns"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.expr(f"tns div {NS_PER_SECOND}").alias("view_sec"),
        F.col("purchase_event_id").alias("next_purchase"),
        F.expr(f"(purchase_tns - tns) div {NS_PER_SECOND}").alias("wait_sec"),
    )


@register(
    "q_join_asof_nearest",
    oracle=f"""
    WITH purchases AS (
        SELECT event_id, user_id, epoch_ns(ts) AS tns
        FROM events WHERE event_type = 'purchase'
    ), views AS (
        SELECT user_id, epoch_ns(ts) AS tns, MAX(event_id) AS view_event_id
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, epoch_ns(ts)
    ), bwd AS (
        SELECT p.event_id, p.user_id, p.tns,
               v.view_event_id AS b_view, v.tns AS b_tns
        FROM purchases p ASOF LEFT JOIN views v
          ON p.user_id = v.user_id AND p.tns >= v.tns
    ), twoway AS (
        SELECT b.event_id, b.user_id, b.tns, b.b_view, b.b_tns,
               v.view_event_id AS f_view, v.tns AS f_tns
        FROM bwd b ASOF LEFT JOIN views v
          ON b.user_id = v.user_id AND b.tns <= v.tns
    )
    SELECT event_id, user_id,
           tns // {NS_PER_SECOND} AS purchase_sec,
           CASE
             WHEN b_view IS NOT NULL AND (f_view IS NULL
                  OR tns - b_tns <= f_tns - tns) THEN b_view
             ELSE f_view
           END AS nearest_view,
           CASE
             WHEN b_view IS NOT NULL AND (f_view IS NULL
                  OR tns - b_tns <= f_tns - tns)
               THEN (tns - b_tns) // {NS_PER_SECOND}
             WHEN f_view IS NOT NULL THEN (tns - f_tns) // {NS_PER_SECOND}
           END AS signed_gap_sec,
           CASE
             WHEN b_view IS NOT NULL AND (f_view IS NULL
                  OR tns - b_tns <= f_tns - tns) THEN 'backward'
             WHEN f_view IS NOT NULL THEN 'forward'
           END AS direction
    FROM twoway
    """,
    doc="Nearest-direction as-of join (pandas merge_asof "
    "direction='nearest'): for every purchase, the view event closest "
    "in time in EITHER direction, ties preferring the earlier "
    "(backward) match — the sensor-alignment semantics time-series "
    "stores ship natively. Composed from the backward and forward "
    "union+window passes of operators/asof.py (each one shuffle on the "
    "join key) and a pure-integer nanosecond-distance pick, so the "
    "choice is exact — no float time math. The oracle runs DuckDB's "
    "native ASOF twice (>= and <=) with the identical integer pick: "
    "independent implementations, same row-atomic semantics. At "
    "100 TB: two key-partitioned windows over the unioned stream — "
    "same cost class as running q_join_asof twice; the pick is "
    "narrow.",
    tags=("join", "asof"),
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("tns")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("vtns"))
        .agg(F.max("event_id").alias("view_event_id"))
    )
    bwd = asof_join(
        purchases,
        views.select(
            "user_id",
            F.col("view_event_id").alias("b_view"),
            F.col("vtns").alias("b_tns"),
        ).withColumn("__rt", F.col("b_tns")),
        on="user_id",
        left_time="tns",
        right_time="__rt",
        right_cols=["b_view", "b_tns"],
        direction="backward",
    )
    both = asof_join(
        bwd,
        views.select(
            "user_id",
            F.col("view_event_id").alias("f_view"),
            F.col("vtns").alias("f_tns"),
        ).withColumn("__rt", F.col("f_tns")),
        on="user_id",
        left_time="tns",
        right_time="__rt",
        right_cols=["f_view", "f_tns"],
        direction="forward",
    )
    prefer_b = F.col("b_view").isNotNull() & (
        F.col("f_view").isNull()
        | (F.col("tns") - F.col("b_tns") <= F.col("f_tns") - F.col("tns"))
    )
    return both.select(
        "event_id",
        "user_id",
        F.expr(f"tns div {NS_PER_SECOND}").alias("purchase_sec"),
        F.when(prefer_b, F.col("b_view")).otherwise(F.col("f_view")).alias(
            "nearest_view"
        ),
        F.when(prefer_b, F.expr(f"(tns - b_tns) div {NS_PER_SECOND}"))
        .when(F.col("f_view").isNotNull(), F.expr(f"(tns - f_tns) div {NS_PER_SECOND}"))
        .alias("signed_gap_sec"),
        F.when(prefer_b, F.lit("backward"))
        .when(F.col("f_view").isNotNull(), F.lit("forward"))
        .alias("direction"),
    )


#: As-of tolerance: matches farther back than this many seconds are
#: discarded (pandas merge_asof(tolerance=...) semantics).
ASOF_TOLERANCE_SEC = 3 * 86400


@register(
    "q_join_asof_tolerance",
    oracle=f"""
    WITH purchases AS (
        SELECT event_id, user_id, epoch_ns(ts) AS tns
        FROM events WHERE event_type = 'purchase'
    ), views AS (
        SELECT user_id, epoch_ns(ts) AS tns, MAX(event_id) AS view_event_id
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, epoch_ns(ts)
    )
    SELECT p.event_id,
           p.user_id,
           p.tns // {NS_PER_SECOND} AS purchase_sec,
           CASE WHEN p.tns - v.tns <= {ASOF_TOLERANCE_SEC * NS_PER_SECOND}
                THEN v.view_event_id END                     AS attributed_view,
           CASE WHEN p.tns - v.tns <= {ASOF_TOLERANCE_SEC * NS_PER_SECOND}
                THEN (p.tns - v.tns) // {NS_PER_SECOND} END  AS gap_sec
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.tns >= v.tns
    """,
    doc="As-of join with TOLERANCE (pandas merge_asof(tolerance=...) "
    "parity, completing the as-of family: backward, forward, nearest, "
    "and now bounded-staleness backward): each purchase attributes to "
    "the most recent prior view only if it happened within 3 days — "
    "stale matches become NULLs, the left rows survive. The bound is "
    "applied as a post-join null-out, so it composes with the same "
    "one-shuffle union+window as-of core; all gap arithmetic is integer "
    "nanoseconds. In a feature store this IS the feature-freshness "
    "rule: a point-in-time feature older than the tolerance is treated "
    "as missing rather than silently served stale. At 100 TB: identical "
    "plan to q_join_asof — one shuffle on the join key — plus a narrow "
    "conditional projection.",
    tags=("join", "asof", "ml"),
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("tns")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("vtns"))
        .agg(F.max("event_id").alias("view_event_id"))
        .withColumn("view_tns", F.col("vtns"))
        .drop("vtns")
    )
    joined = asof_join(
        purchases,
        views,
        on="user_id",
        left_time="tns",
        right_time="view_tns",
        right_cols=["view_event_id", "view_tns"],
    )
    within = F.col("tns") - F.col("view_tns") <= ASOF_TOLERANCE_SEC * NS_PER_SECOND
    return joined.select(
        "event_id",
        "user_id",
        F.expr(f"tns div {NS_PER_SECOND}").alias("purchase_sec"),
        F.when(within, F.col("view_event_id")).alias("attributed_view"),
        F.when(within, F.expr(f"(tns - view_tns) div {NS_PER_SECOND}")).alias("gap_sec"),
    )
