"""Connected components over the near-dup pair graph — the iterative
algorithm that turns pairwise near-dup hits into dedup CLUSTERS (the
drop-doc_b rule in corpus.py under-merges when A~B and B~C but not A~C;
components give each document its cluster's canonical min id).

Two Spark implementations, both driver-loop = control-flow-only:

- ``connected_components_star`` (the PRODUCTION path, used by
  q_dedup_clusters): alternating large-star / small-star rounds (Kiveris
  et al., "Connected Components in MapReduce and Beyond", SoCC'14 — a
  public algorithm). Each round is two join+agg passes over the edge
  list; the edge set contracts toward a star forest in O(log^2 n) rounds
  REGARDLESS of graph diameter — the property that makes the 100 TB
  claim honest, since near-dup graphs of crawled corpora contain long
  template chains exactly where the data is worst.
- ``connected_components`` (label propagation): min-label flood, one
  join+agg per iteration, O(diameter) shuffles. Kept as the independent
  reference implementation the property tests compare against.

Oracle: DuckDB ``WITH RECURSIVE`` transitive closure + MIN per node —
a third, completely independent formulation of the same fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    fan_out,
    materialize,
    neardup_pairs,
)
from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.plans.registry import register

MAX_ITERATIONS = 20


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = MAX_ITERATIONS,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min node
    id reachable. Label propagation to fixpoint (bounded by
    ``max_iterations``; raises if not converged — never silently wrong)."""
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
    for _ in range(max_iterations):
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
    raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: for every node u, connect each STRICTLY LARGER
    neighbor v to m(u) = min(neighbors(u) + {u}). Every undirected edge is
    processed from its smaller endpoint's perspective; output edges are
    oriented child > parent."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("minv"))
        .select("u", F.least("minv", F.col("u")).alias("m"))
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: orient every edge toward its smaller endpoint,
    then for every node u re-hang u and all its smaller neighbors off
    m(u) = min(smaller neighbors)."""
    d = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")).distinct()
    m = d.groupBy("u").agg(F.min("v").alias("m"))
    rehung = (
        d.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edge = m.select("u", F.col("m").alias("v"))
    return rehung.unionByName(self_edge).filter(F.col("u") != F.col("v")).distinct()


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = MAX_ITERATIONS,
) -> DataFrame:
    """(node, label) via alternating large-star/small-star contraction —
    converges in O(log^2 n) rounds independent of diameter (module
    docstring). Fixpoint test: the oriented edge set is unchanged by a
    full round (set equality via exceptAll counts, not a heuristic).
    Raises if ``max_rounds`` is hit — never silently wrong."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )
    # checkpoint the edges FIRST so nodes/rounds don't re-run the upstream
    # pair pipeline (same contract as connected_components)
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = e
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        changed = nxt.exceptAll(cur).count() + cur.exceptAll(nxt).count()
        cur = nxt
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components_star did not converge in {max_rounds} rounds")
    # at fixpoint ``cur`` is a star forest: (child, root). Roots appear
    # only on the right side; give them self-labels.
    children = cur.select(F.col("u").alias("node"), F.col("v").alias("label"))
    roots = nodes.join(children.select("node").distinct(), "node", "left_anti").select(
        "node", F.col("node").alias("label")
    )
    return children.groupBy("node").agg(F.min("label").alias("label")).unionByName(roots)


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
    "alternating large-star/small-star contraction (O(log^2 n) rounds "
    "independent of graph diameter — the production algorithm; driver "
    "loop is control flow only, each round two join+aggs). Verified "
    "against BOTH the label-propagation reference implementation "
    "(tests/test_dedup_property.py) and the DuckDB recursive-CTE "
    "transitive closure — three independent fixpoint formulations.",
    tags=("dedup", "iterative"),
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load(spark, sf_dir, "documents"))
    # shared minhash pipeline (doc-granular checkpoints); the contraction
    # loop then checkpoints its own state (connected_components_star)
    pairs = neardup_pairs(docs)
    comp = connected_components_star(pairs.select("doc_a", "doc_b"), "doc_a", "doc_b")
    return comp.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))
