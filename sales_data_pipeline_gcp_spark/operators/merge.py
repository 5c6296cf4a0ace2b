"""MERGE / upsert emulation (guide "CDC / SCD2": no Delta in this
environment, so MERGE INTO is composed from anti-join + union — the
standard emulation on plain parquet).

``merge_upsert`` is the operator; ``q_merge_upsert`` demonstrates it with a
deterministic updates stream derived from orders (each customer's latest
order re-prices their account balance) against the customer dimension.

Scale: both sides shuffle once on the key; with bucketed tables the
anti-join is shuffle-free. SCD2 (history-keeping) is the same shape with
``valid_from``/``valid_to`` stamping instead of dropping the old row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.functions.hashing import sql_shared_hash
from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.operators.core import dedup_by_key
from sales_data_pipeline_gcp_spark.plans.registry import register


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE: rows of ``target`` whose key has an update are replaced by the
    update row; unmatched updates are inserted; everything else survives.
    ``updates`` must be unique per key and share the target schema."""
    untouched = target.join(updates, key, "left_anti")
    return untouched.unionByName(updates)


@register(
    "q_merge_upsert",
    oracle="""
    WITH latest_order AS (
        SELECT o_custkey, o_totalprice, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ), updates AS (
        SELECT c.c_custkey, c.c_name, c.c_nationkey,
               l.o_totalprice - 100.0 AS c_acctbal,
               'UPDATED' AS c_mktsegment
        FROM customer c JOIN latest_order l
          ON c.c_custkey = l.o_custkey AND l.rn = 1
    )
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
    WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM updates
    """,
    doc="MERGE/upsert emulation (anti-join + union) on plain parquet: the "
    "customer dimension absorbs a CDC-style updates stream (deterministic: "
    "latest order per customer re-prices the balance, exact-arithmetic update rule (cross-engine round() at half-cent boundaries diverges)). Customers without "
    "orders pass through untouched.",
    tags=("merge",),
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    latest = dedup_by_key(
        orders,
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    )
    updates = (
        cust.join(latest, cust.c_custkey == latest.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            (F.col("o_totalprice") - 100.0).alias("c_acctbal"),
            F.lit("UPDATED").alias("c_mktsegment"),
        )
    )
    return merge_upsert(cust, updates, "c_custkey")


@register(
    "q_scd2_intervals",
    oracle="""
    SELECT o_custkey AS custkey,
           o_orderkey AS change_id,
           o_totalprice AS value,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS valid_to,
           LEAD(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) IS NULL AS is_current
    FROM orders
    """,
    doc="SCD Type-2 interval construction — the warehouse history op: a "
    "stream of per-key change events becomes validity intervals "
    "[valid_from, valid_to) with an open-ended current row, via LEAD over "
    "(key, event-time) with a unique-id tiebreak (same-timestamp changes "
    "are ordered deterministically, so both engines build identical "
    "histories). One shuffle on the key; each key's history is built in "
    "one sorted pass — at 100 TB this is the standard dimension-history "
    "rebuild, and the incremental variant merges only keys present in "
    "the change batch (merge_upsert above).",
    tags=("merge",),
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    nxt = F.lead("o_orderdate").over(w)
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("change_id"),
        F.col("o_totalprice").alias("value"),
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# --- Merkle-style table reconciliation ------------------------------------

#: diff granularity: rows bucket by key % DIFF_BUCKETS; a bucket whose
#: (count, xor-of-row-signatures) agrees on both sides is PROVEN equal
#: without comparing any row.
DIFF_BUCKETS = 256
#: simulated drift in the replica: every 997th key gets an update, every
#: 1499th is missing (deterministic, so the oracle replays it exactly).
DIFF_UPDATE_MOD = 997
DIFF_DELETE_MOD = 1499

_DIFF_ROW_SIG = (
    "CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|' "
    "|| CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR) || '|' || o_orderstatus"
)


@register(
    "q_table_diff",
    oracle=f"""
    WITH a AS (
        SELECT o_orderkey % {DIFF_BUCKETS} AS bucket,
               {sql_shared_hash(_DIFF_ROW_SIG)} AS sig
        FROM orders
    ), b_rows AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderkey % {DIFF_UPDATE_MOD} = 0
                    THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % {DIFF_DELETE_MOD} <> 0
    ), b AS (
        SELECT o_orderkey % {DIFF_BUCKETS} AS bucket,
               {sql_shared_hash(_DIFF_ROW_SIG)} AS sig
        FROM b_rows
    ), ba AS (
        SELECT bucket, COUNT(*) AS n_a, bit_xor(sig) AS xor_a FROM a GROUP BY bucket
    ), bb AS (
        SELECT bucket, COUNT(*) AS n_b, bit_xor(sig) AS xor_b FROM b GROUP BY bucket
    )
    SELECT COALESCE(ba.bucket, bb.bucket) AS bucket,
           COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
           xor_a, xor_b
    FROM ba FULL OUTER JOIN bb ON ba.bucket = bb.bucket
    WHERE COALESCE(n_a, 0) <> COALESCE(n_b, 0)
       OR COALESCE(xor_a, 0) <> COALESCE(xor_b, 0)
    """,
    doc=f"Merkle-style table reconciliation (the anti-entropy / "
    "replica-validation shape): each side folds every row into a "
    f"per-bucket (count, XOR-of-row-signatures) digest — {DIFF_BUCKETS} "
    "buckets by key — and only buckets whose digests disagree are "
    "reported. XOR is commutative/associative, so the digest is "
    "merge-order-independent with NO decimal machinery, and a clean "
    "bucket proves equality of all its rows without moving any of them: "
    "at 100 TB the diff of two replicas costs two scans + a "
    f"{DIFF_BUCKETS}-row join, and only flagged buckets are re-read at "
    "row granularity (recursing into a flagged bucket with a finer "
    "modulus is the Merkle-tree descent). The replica's drift here is "
    "synthesized deterministically (update every "
    f"{DIFF_UPDATE_MOD}th key, drop every {DIFF_DELETE_MOD}th) so the "
    "oracle replays the exact same divergence. Row signatures hash the "
    "money column at integer cents — casting raw doubles to VARCHAR is "
    "engine-dependent formatting, the cross-engine trap this query's "
    "signature definition documents.",
    tags=("warehouse",),
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sales_data_pipeline_gcp_spark.functions.hashing import shared_hash

    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    sig_input = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        cents.cast("string"),
        F.col("o_orderstatus"),
    )

    def digest(df: DataFrame, n_col: str, x_col: str) -> DataFrame:
        return (
            df.select(
                (F.col("o_orderkey") % DIFF_BUCKETS).alias("bucket"),
                shared_hash(sig_input).alias("sig"),
            )
            .groupBy("bucket")
            .agg(F.count("*").alias(n_col), F.bit_xor("sig").alias(x_col))
        )

    a = digest(o, "n_a", "xor_a")
    b_rows = o.filter(F.col("o_orderkey") % DIFF_DELETE_MOD != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % DIFF_UPDATE_MOD == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    b = digest(b_rows, "n_b", "xor_b")
    return (
        a.join(b, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
            "xor_a",
            "xor_b",
        )
        .filter(
            (F.col("n_a") != F.col("n_b"))
            | (F.coalesce("xor_a", F.lit(0)) != F.coalesce("xor_b", F.lit(0)))
        )
    )


# --- CDC changelog compaction ----------------------------------------------

#: every 10th change event is a tombstone (delete) — deterministic, so the
#: oracle replays the same log.
CDC_DELETE_MOD = 10


@register(
    "q_cdc_apply",
    oracle=f"""
    WITH log AS (
        SELECT o_custkey AS key,
               o_orderkey AS change_id,
               o_orderdate AS changed_at,
               o_totalprice AS value,
               CASE WHEN o_orderkey % {CDC_DELETE_MOD} = 0 THEN 'D' ELSE 'U' END AS op
        FROM orders
    ), ranked AS (
        SELECT key, change_id, value, op,
               ROW_NUMBER() OVER (PARTITION BY key
                                  ORDER BY changed_at DESC, change_id DESC) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n_changes
        FROM log
    )
    SELECT key AS custkey, change_id AS last_change_id, value, n_changes
    FROM ranked WHERE rn = 1 AND op = 'U'
    """,
    doc="CDC changelog compaction — the read-side of every Debezium-style "
    "ingest: a log of per-key change events (upserts + tombstones, here "
    f"synthesized deterministically from orders with every {CDC_DELETE_MOD}th "
    "change a delete) collapses to the current snapshot by last-writer-wins: "
    "keep each key's latest event by (event_time, change_id) — the unique-id "
    "tiebreak makes same-timestamp races deterministic in both engines — and "
    "drop keys whose final event is a tombstone. One shuffle on the key, one "
    "sorted pass per key (the same shape Flink's changelog normalize and "
    "Delta's CDF compaction use). Distinct from q_merge_upsert, which applies "
    "an already-compacted batch TO a target; this query produces that batch "
    "from the raw log. At 100 TB the log is ingested partitioned by key and "
    "compaction is per-partition with no further exchange; AQE splits hot "
    "keys.",
    tags=("merge", "warehouse"),
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    log = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("change_id"),
        F.col("o_orderdate").alias("changed_at"),
        F.col("o_totalprice").alias("value"),
        F.when(F.col("o_orderkey") % CDC_DELETE_MOD == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    w = W.partitionBy("key")
    ranked = log.select(
        "key",
        "change_id",
        "value",
        "op",
        F.row_number()
        .over(w.orderBy(F.col("changed_at").desc(), F.col("change_id").desc()))
        .alias("rn"),
        F.count("*").over(w).alias("n_changes"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("op") == "U")).select(
        F.col("key").alias("custkey"),
        F.col("change_id").alias("last_change_id"),
        "value",
        "n_changes",
    )


# --- entity-resolution survivorship (golden record) ------------------------

#: synthetic duplicate clusters: customers agreeing mod this prime are
#: treated as one real-world entity (every cluster has several members at
#: every fixture SF, so each survivorship rule actually arbitrates).
SURV_CLUSTER_MOD = 929


@register(
    "q_survivorship",
    oracle=f"""
    WITH members AS (
        SELECT c_custkey % {SURV_CLUSTER_MOD} AS cluster_id,
               c_custkey, c_name, c_acctbal, c_mktsegment,
               ROW_NUMBER() OVER (PARTITION BY c_custkey % {SURV_CLUSTER_MOD}
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        FROM customer
    )
    SELECT cluster_id,
           CAST(MIN(c_custkey) AS BIGINT)        AS record_id,
           CAST(COUNT(*) AS BIGINT)              AS n_members,
           MAX(c_acctbal)                        AS best_acctbal,
           MAX(CASE WHEN rn = 1 THEN c_mktsegment END) AS segment,
           MIN(c_name)                           AS first_name
    FROM members
    GROUP BY cluster_id
    ORDER BY cluster_id
    """,
    doc="Entity-resolution survivorship (golden-record merge) — the step "
    "AFTER dedup clustering (q_dedup_clusters) that MDM pipelines run: each "
    "duplicate cluster collapses to ONE golden record with field-level "
    "rules arbitrating between members. Rules demonstrated: record id = "
    "oldest member (MIN key), balance = numeric MAX, segment = donated by "
    "the most-trusted member (highest balance, key-ASC tiebreak via "
    "ROW_NUMBER so both engines pick the same donor), name = "
    "lexicographic first. Clusters are synthesized by a mod-prime "
    "congruence so every cluster has multiple members and each rule "
    "genuinely arbitrates. Shape: one window + one hash aggregate over "
    "the same key — Catalyst reuses the single shuffle, partial aggregation "
    "applies map-side, and at 100 TB skewed clusters split under AQE. "
    "MAX/MIN on doubles are exact (no accumulation), so the result is "
    "bit-identical cross-engine.",
    tags=("merge", "dedup"),
)
def q_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    c = load(spark, sf_dir, "customer")
    members = c.select(
        (F.col("c_custkey") % SURV_CLUSTER_MOD).alias("cluster_id"),
        "c_custkey",
        "c_name",
        "c_acctbal",
        "c_mktsegment",
    )
    rn = F.row_number().over(
        W.partitionBy("cluster_id").orderBy(
            F.col("c_acctbal").desc(), F.col("c_custkey").asc()
        )
    )
    return (
        members.withColumn("rn", rn)
        .groupBy("cluster_id")
        .agg(
            F.min("c_custkey").alias("record_id"),
            F.count("*").alias("n_members"),
            F.max("c_acctbal").alias("best_acctbal"),
            F.max(F.when(F.col("rn") == 1, F.col("c_mktsegment"))).alias("segment"),
            F.min("c_name").alias("first_name"),
        )
        .orderBy("cluster_id")
    )
