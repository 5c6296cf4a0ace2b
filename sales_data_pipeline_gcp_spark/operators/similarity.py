"""Similarity search over embeddings (SURVEY.md §2.4).

- ``q_sim_topk``: brute-force cosine top-k — the exact baseline, oracled.
- ``q_sim_ann_ivf``: IVF-style approximate NN — k-means-free variant using
  label centroids as the coarse quantizer (deterministic, no training):
  probe the ``NPROBE`` nearest centroids, brute-force only within those
  cells. Rows-only for the driver; tests/test_similarity.py asserts
  recall@k against the exact baseline.

Scale: brute force is O(n) per query and only acceptable for one-off
queries; the IVF path turns it into O(n/cells * nprobe). At 100 TB the
centroid table is tiny (one row per cell) and broadcast; the cell-blocked
join shuffles each vector once by cell id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.operators.dedup import EMBED_DIM, _sql_dot, spark_dot
from sales_data_pipeline_gcp_spark.plans.registry import register

QUERY_VEC_ID = 0
TOP_K = 10
NUM_CELLS = 16
NPROBE = 3


@register(
    "q_sim_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    scored AS (
        SELECT vec_id, label,
               {_sql_dot('embedding', 'qe')}
                 / (SQRT({_sql_dot('embedding', 'embedding')})
                    * SQRT({_sql_dot('qe', 'qe')})) AS cosine
        FROM embeddings, q
        WHERE vec_id <> {QUERY_VEC_ID}
    )
    SELECT vec_id, label, cosine
    FROM scored
    ORDER BY cosine DESC, vec_id
    LIMIT {TOP_K}
    """,
    doc="Brute-force cosine top-k against the query vector (vec_id=0): "
    "broadcast the single query row, score every vector, "
    "TakeOrderedAndProject keeps k per partition. Exact baseline for ANN.",
    tags=("similarity", "flagship"),
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qe"))
    dot = spark_dot(F.col("embedding"), F.col("qe"))
    cosine = dot / (
        F.sqrt(spark_dot(F.col("embedding"), F.col("embedding")))
        * F.sqrt(spark_dot(F.col("qe"), F.col("qe")))
    )
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


def _cosine(a, b):
    return spark_dot(a, b) / (F.sqrt(spark_dot(a, a)) * F.sqrt(spark_dot(b, b)))


def ivf_assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (ties broken by
    LOWEST cell id). Fully narrow: the centroid table is aggregated to a
    single array-of-structs row and broadcast, and the per-vector argmax is
    one in-row ``array_max`` over the scored structs — the corpus is never
    replicated (round 1 crossJoined x n_cells) and never shuffled (round 1
    ran a ``row_number`` window over the exploded copies; at 100 TB that
    shuffle IS the job). Struct ordering does the tie-break: max on
    (csim, -cell) prefers higher similarity, then lower cell id."""
    cents_row = cents.select(F.struct("cell", "centroid").alias("c")).agg(
        F.collect_list("c").alias("cents")
    )
    scored = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            _cosine(F.col("embedding"), c["centroid"]).alias("csim"),
            (-c["cell"]).alias("neg_cell"),
        ),
    )
    best = F.array_max(scored)
    return (
        e.crossJoin(F.broadcast(cents_row))  # single-row: replication factor 1
        .withColumn("cell", (-best["neg_cell"]).cast("long"))
        .drop("cents")
    )


@register(
    "q_sim_ann_ivf",
    oracle=None,  # approximate: verified by recall test against q_sim_topk
    doc=f"IVF-style ANN: {NUM_CELLS} coarse cells seeded from the first "
    f"{NUM_CELLS} vectors (deterministic, training-free); every vector is "
    f"assigned to its nearest cell, the query probes the {NPROBE} nearest "
    "cells, and only those cells are exactly re-ranked (~20% of the corpus "
    "here). Centroids/probe list are broadcast — at 100 TB the corpus is "
    "hash-partitioned by cell so a probe touches nprobe/cells of the data. "
    "Recall@k asserted >= 0.9 in tests/test_similarity.py.",
    tags=("similarity",),
)
def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qe"))
    cents = (
        e.filter(F.col("vec_id") < NUM_CELLS)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("centroid"))
    )
    assigned = ivf_assign(e, cents)

    probed = (
        cents.crossJoin(F.broadcast(q))
        .select("cell", _cosine(F.col("centroid"), F.col("qe")).alias("csim"))
        .orderBy(F.col("csim").desc(), F.col("cell").asc())
        .limit(NPROBE)
        .select("cell")
    )

    return (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", _cosine(F.col("embedding"), F.col("qe")).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )
