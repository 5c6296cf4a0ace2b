"""Connected components over the near-dup pair graph — the iterative
algorithm that turns pairwise near-dup hits into dedup CLUSTERS (the
drop-doc_b rule in corpus.py under-merges when A~B and B~C but not A~C;
components give each document its cluster's canonical min id).

Spark side: label-propagation loop — every node starts as its own label,
each iteration takes the min label over neighbors, until fixpoint. The loop
is DRIVER-side control flow only; each iteration is a distributed
join+aggregate, so the algorithm scales like O(diameter) shuffles. A
production run would use large-star/small-star (fewer iterations); plain
propagation is fine at fixture diameters.

Oracle: DuckDB ``WITH RECURSIVE`` transitive closure + MIN per node —
a completely independent formulation of the same fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    lsh_candidate_pairs,
    materialize,
    minhash_signatures,
    fan_out,
    shingles_from,
    verify_jaccard,
)
from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.plans.registry import register

MAX_ITERATIONS = 20


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, component) for every node in ``edges``; component = min node
    id reachable. Label propagation to fixpoint (bounded by
    MAX_ITERATIONS; raises if not converged — never silently wrong)."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    # checkpoint the edge set FIRST, then derive labels from the
    # checkpointed plan — deriving labels from the raw plan would
    # re-execute the whole upstream pipeline a second time
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    ).localCheckpoint(eager=True)
    for _ in range(MAX_ITERATIONS):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select("node", F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"))
        )
        # localCheckpoint truncates the exponentially-growing lineage; the
        # convergence check is the honest fixpoint test
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {MAX_ITERATIONS} iterations")


from sales_data_pipeline_gcp_spark.operators.dedup import _minhash_sql

_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE words AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents
    ), shingles AS (
        SELECT doc_id,
               UNNEST(list_distinct(list_transform(
                   range(1, len(ws) - 1), i -> array_to_string(ws[i:i+2], ' ')))) AS shingle
        FROM words WHERE len(ws) >= 3
    ),
    {_minhash_sql().strip()},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
        FROM candidates c
        JOIN shingles a ON c.doc_a = a.doc_id
        JOIN shingles b ON c.doc_b = b.doc_id AND a.shingle = b.shingle
        GROUP BY c.doc_a, c.doc_b
    ), pairs AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= {JACCARD_THRESHOLD}
    ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ), reach AS (
        SELECT a AS node, a AS label FROM edges
        UNION
        SELECT e.a, r.label FROM edges e JOIN reach r ON e.b = r.node
    )
    SELECT node AS doc_id, MIN(label) AS component
    FROM reach GROUP BY node
    """


@register(
    "q_dedup_clusters",
    oracle=_CLUSTERS_ORACLE,
    doc="Near-dup clustering: MinHash-LSH pairs -> connected components via "
    "distributed label propagation (driver loop = control flow only; each "
    "iteration one join+agg). Oracle: DuckDB recursive-CTE transitive "
    "closure — an independent fixpoint formulation.",
    tags=("dedup", "iterative"),
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load(spark, sf_dir, "documents"))
    # same materialization contract as q_dedup_minhash: sh and sig each
    # feed multiple branches; the propagation loop then checkpoints its
    # own state (connected_components)
    sh = materialize(shingles_from(docs))
    sig = materialize(minhash_signatures(sh))
    cand = lsh_candidate_pairs(sig)
    pairs = verify_jaccard(cand, sh).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    comp = connected_components(pairs.select("doc_a", "doc_b"), "doc_a", "doc_b")
    return comp.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))
