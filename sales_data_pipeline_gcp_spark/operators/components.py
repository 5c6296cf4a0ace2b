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
    _JACCARD_PAIRS_SQL,
    _SHINGLES_SQL,
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
    sym = materialize(sym, label="labelprop_edges")
    labels = materialize(
        sym.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node")),
        label="labelprop_seed",
    )
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
        new_labels = materialize(new_labels, label="labelprop_iter")
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


def _large_star(
    e: DataFrame, *, input_oriented: bool = False, dedup_output: bool = True
) -> DataFrame:
    """One large-star round: for every node u, connect each STRICTLY LARGER
    neighbor v to m(u) = min(neighbors(u) + {u}). Every undirected edge is
    processed from its smaller endpoint's perspective; output edges are
    oriented child > parent (u > v strictly: v = m(u_old) <= u_old < u).

    ``input_oriented=True`` asserts the caller's edge set is DISTINCT and
    strictly oriented u > v — then the symmetrized union cannot contain
    duplicates (the two branches live in disjoint half-planes) and the
    symmetrization ``distinct`` (one full 2|E| exchange) is skipped.
    ``dedup_output=False`` skips the output ``distinct`` for callers whose
    next operation re-deduplicates anyway (``_small_star`` starts with
    one). Both flags exist for the contraction loop (guide §2.4: remove
    shuffles outright); default behavior is unchanged for arbitrary input.
    With ``dedup_output=True`` the output is duplicate-free — the
    invariant the loop's cheap set-equality fixpoint test consumes."""
    from pyspark.sql import Window as W

    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # ONE u-keyed exchange feeds everything below (guide §2.4: operations
    # keyed the same way share an exchange): HashPartitioning(u) satisfies
    # the distinct's (u,v) clustering AND the window's u clustering, and
    # m(u) = min over the u-partition is a WINDOW, not a groupBy+self-join
    # — the join formulation re-executed the whole upstream once per join
    # side (broadcast build) and cost 2 extra exchanges + a broadcast job
    # per call (round-13 plan probe: 10 Exchange / 4 BroadcastHashJoin for
    # one fused round; the window form plans 3 Exchange / 0 joins).
    sym = sym.repartition("u")
    if not input_oriented:
        sym = sym.distinct()
    m = F.least(F.min("v").over(W.partitionBy("u")), F.col("u"))
    out = (
        sym.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    return out.distinct() if dedup_output else out


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: orient every edge toward its smaller endpoint,
    then for every node u re-hang u and all its smaller neighbors off
    m(u) = min(smaller neighbors). Output is DISTINCT and strictly
    oriented u > v (rehung: u = v_old >= m with equality filtered; self
    edge: u > v >= m) — the duplicate-free invariant the contraction
    loop's count-equality + one-sided exceptAll fixpoint test relies on
    (round-12 ADVICE: guard the invariant where it is produced)."""
    from pyspark.sql import Window as W

    # same one-exchange sharing as _large_star: the u-keyed repartition
    # satisfies the distinct's (u,v) clustering and the m(u) window; no
    # groupBy+join, so no upstream re-execution for a broadcast build.
    d = (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .repartition("u")
        .distinct()
        .withColumn("m", F.min("v").over(W.partitionBy("u")))
    )
    rehung = d.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    # one (u, m) row PER EDGE instead of per u — the closing distinct
    # (which the rehang's child re-keying forces anyway) folds the
    # duplicates, same volume class as the edge set itself
    self_edge = d.select("u", F.col("m").alias("v"))
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
    e = materialize(e, label="cc_star_edges")
    cur = e
    n_cur = cur.count()
    for _ in range(max_rounds):
        # loop-body fusion (guide §2.4, round 13): ``cur`` is always
        # DISTINCT and strictly oriented u > v (the initial greatest/least
        # distinct, then _small_star's output invariant), so _large_star
        # skips its symmetrization distinct, and its output distinct is
        # skipped because _small_star immediately re-deduplicates — two
        # full edge-set exchanges (= two AQE stage-jobs) removed per round.
        nxt = materialize(
            _small_star(_large_star(cur, input_oriented=True, dedup_output=False)),
            label="cc_star_round",
        )
        # set-equality fixpoint test, cheapened (guide §2.4): both rounds'
        # edge sets are ``.distinct()`` outputs, so equality ⇔ equal
        # cardinality AND empty one-sided difference. Counting the (already
        # checkpointed) new set is near-free, and the exceptAll pass runs
        # only when the counts match — non-final rounds skip it entirely
        # (the previous shape paid TWO full exceptAll shuffles per round).
        n_nxt = nxt.count()
        changed = 1 if n_nxt != n_cur else nxt.exceptAll(cur).count()
        cur, n_cur = nxt, n_nxt
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components_star did not converge in {max_rounds} rounds")
    # at fixpoint ``cur`` is a star forest: (child, root). Roots appear
    # only on the right side; give them self-labels. ``nodes`` is derived
    # here from the CHECKPOINTED initial edge set — it feeds exactly one
    # anti-join, so the round-12 eager checkpoint of it was one extra job
    # for a subtree that executes once anyway (removed round 13).
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
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


# --- PageRank (fixed-iteration, fully oracled) ----------------------------

#: PageRank over the customer<->supplier trade graph: damping 0.85, a FIXED
#: 3 iterations from the uniform vector — fixing the iteration count is what
#: makes an iterative algorithm oracle-adjudicable (the DuckDB side unrolls
#: the same three steps as CTEs; convergence-based stopping would couple
#: the result to float tolerance). Supplier node ids offset by NODE_OFFSET
#: to keep the two key spaces disjoint.
PR_ITERATIONS = 3
PR_DAMPING = 0.85
NODE_OFFSET = 1_000_000
PR_TOPN = 20

_PR_EDGES_SQL = f"""
    pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), edges AS (
        SELECT c AS src, s + {NODE_OFFSET} AS dst FROM pairs
        UNION ALL
        SELECT s + {NODE_OFFSET} AS src, c AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank FROM nodes CROSS JOIN nn)
"""


def _pr_iter_sql(prev: str, cur: str) -> str:
    return f"""
    {cur} AS (
        SELECT nd.node,
               CAST(0.15 AS DOUBLE) / nn.n
                 + CAST({PR_DAMPING} AS DOUBLE)
                   * CAST(COALESCE(SUM(CAST(r.rank / d.deg AS DECIMAL(38,12))), 0) AS DOUBLE) AS rank
        FROM nodes nd
        CROSS JOIN nn
        LEFT JOIN edges e ON e.dst = nd.node
        LEFT JOIN {prev} r ON r.node = e.src
        LEFT JOIN outdeg d ON d.src = e.src
        GROUP BY nd.node, nn.n
    )"""


_PR_ORACLE = (
    "WITH "
    + _PR_EDGES_SQL
    + ","
    + ",".join(_pr_iter_sql(f"r{i}", f"r{i + 1}") for i in range(PR_ITERATIONS))
    + f"""
    SELECT node, node >= {NODE_OFFSET} AS is_supplier, rank AS pagerank
    FROM r{PR_ITERATIONS}
    ORDER BY pagerank DESC, node ASC
    LIMIT {PR_TOPN}
    """
)


@register(
    "q_pagerank",
    oracle=_PR_ORACLE,
    doc=f"PageRank (damping {PR_DAMPING}, {PR_ITERATIONS} fixed iterations "
    "from uniform) over the symmetric customer–supplier trade graph "
    "(edge when a customer's order contains a supplier's line). Each "
    "iteration is one node-keyed join (rank/outdeg weights), one edge-"
    "keyed join, and one dst-grouped sum — per-node contributions "
    "quantize to DECIMAL(38,12) so the neighbor sum is merge-order-"
    "independent and every iteration's input is bit-identical cross-"
    "engine (same exactness lever as q_kmeans_iter). The symmetric edge "
    "construction guarantees no dangling nodes, so no rank mass "
    "redistribution term is needed. At 100 TB: edges hash-partition by "
    "src once and every iteration reuses that partitioning for the "
    "weight join; the rank vector is |nodes|-sized (orders of magnitude "
    "smaller than edges) and the per-iteration shuffle is the dst-keyed "
    "contribution sum with map-side combine — the standard Pregel-class "
    "cost, O(|edges|) per round with a fixed round count.",
    tags=("graph", "iterative"),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sales_data_pipeline_gcp_spark.functions.exact import dec

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), (F.col("s") + NODE_OFFSET).alias("dst")
    ).unionByName(
        pairs.select((F.col("s") + NODE_OFFSET).alias("src"), F.col("c").alias("dst"))
    )
    # edges / nodes / outdeg feed EVERY iteration branch; without cutting
    # their lineage each unrolled iteration re-derives the orders-lineitem
    # join (Spark does no cross-branch subtree reuse — measured 12.9s vs
    # ~2s at sf0.1). All three checkpoints are edge- or node-sized.
    edges = materialize(edges)
    nodes = materialize(edges.select(F.col("src").alias("node")).distinct())
    outdeg = edges.groupBy(F.col("src")).agg(F.count("*").alias("deg"))
    nn_row = nodes.agg(F.count("*").alias("n"))

    # Hoist the STATIC per-node state (out-degree, node count) into the
    # checkpointed rank table ONCE (guide §2.4: two operations keyed the
    # same way share one pass): every node is a src by the symmetric edge
    # construction, so the inner join is total. The loop then derives the
    # weight vector by pure projection — the previous shape re-joined
    # ranks to outdeg and re-broadcast nn_row every iteration (one extra
    # join + broadcast exchange per round, measured ~0.9s of the 3.7s
    # sf0.1 plan).
    ranks = materialize(
        nodes.join(outdeg, nodes["node"] == outdeg["src"])
        .crossJoin(F.broadcast(nn_row))
        .select("node", "deg", "n", (F.lit(1.0) / F.col("n")).alias("rank"))
    )
    for _ in range(PR_ITERATIONS):
        srcw = ranks.select(
            F.col("node").alias("src"), (F.col("rank") / F.col("deg")).alias("w")
        )
        # the rank-weight vector is |nodes|-sized — orders of magnitude
        # smaller than edges on any real trade graph — so broadcasting it
        # keeps the edge list UNSHUFFLED through every iteration (measured
        # 5-6s/iter as a shuffle join vs ~1.2s broadcast at sf0.1; AQE does
        # not rescue the planned SMJ because the probe-side exchange is
        # already scheduled). If ranks ever outgrow broadcast, the Pregel
        # answer is co-partitioned storage: bucketBy(node) both edge and
        # rank tables so the per-iteration join is exchange-free
        # (q_join_bucketed demonstrates exactly that plan).
        contrib = (
            edges.join(F.broadcast(srcw), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.coalesce(F.sum(dec(F.col("w"), 12)), F.lit(0).cast("decimal(38,12)")).cast("double").alias("s"))
        )
        # per-iteration checkpoint (|nodes| rows): iteration k's plan must
        # not replay iterations 1..k-1 — same discipline as
        # connected_components' rounds. deg/n ride along so the next
        # iteration's weight projection needs no join.
        ranks = materialize(
            ranks.join(F.broadcast(contrib), "node", "left")
            .select(
                "node",
                "deg",
                "n",
                (
                    F.lit(0.15) / F.col("n")
                    + F.lit(PR_DAMPING) * F.coalesce(F.col("s"), F.lit(0).cast("double"))
                ).alias("rank"),
            )
        )
    return (
        ranks.select(
            "node",
            (F.col("node") >= NODE_OFFSET).alias("is_supplier"),
            F.col("rank").alias("pagerank"),
        )
        .orderBy(F.col("pagerank").desc(), F.col("node").asc())
        .limit(PR_TOPN)
    )


# --- triangle enumeration over the near-dup graph -------------------------


@register(
    "q_graph_triangles",
    oracle=f"""
    WITH {_SHINGLES_SQL.strip()},
    {_JACCARD_PAIRS_SQL.strip()},
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM jaccard_pairs
        WHERE jaccard >= {JACCARD_THRESHOLD}
    )
    SELECT e1.a AS doc_a, e1.b AS doc_b, e2.b AS doc_c
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    doc="Triangle enumeration over the near-dup similarity graph: triples "
    "of documents that are ALL pairwise near-duplicates — the template-"
    "family signal (a triangle is much stronger evidence of a shared "
    "boilerplate source than two independent pair hits), and the classic "
    "distributed-join graph kernel. Edges are the exact-Jaccard pairs "
    "oriented a<b, so each triangle appears exactly once as a<b<c: one "
    "self-join builds wedges, a second closes them. At 100 TB the "
    "standard refinement is DEGREE ordering instead of id ordering — "
    "orient each edge toward the higher-degree endpoint so wedge count "
    "is bounded by sum of C(out-deg, 2) with out-deg <= O(sqrt(|E|)) "
    "(Suri & Vassilvitskii's MapReduce triangle counting); id ordering "
    "suffices here because near-dup graphs are sparse by construction — "
    "candidates track true duplicates, not pairs.",
    tags=("graph", "dedup"),
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sales_data_pipeline_gcp_spark.operators.dedup import (
        jaccard_pairs,
        shingle_arrays,
    )

    # checkpoint the |docs|-row ARRAY table, derive the exploded stream
    # lazily, per-doc sizes in-row (round 13 — same restructure as
    # q_dedup_ngram_jaccard; the shingle self-join's two sides share one
    # exchange via ReusedExchange)
    shs = materialize(shingle_arrays(fan_out(load(spark, sf_dir, "documents"))))
    sh = shs.select("doc_id", F.explode("shs").alias("shingle"))
    edges = materialize(
        jaccard_pairs(sh, shs_arrays=shs)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    return (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .select(
            F.col("e1.a").alias("doc_a"),
            F.col("e1.b").alias("doc_b"),
            F.col("e2.b").alias("doc_c"),
        )
    )


@register(
    "q_graph_triangles_lsh",
    oracle=f"""
    WITH {_SHINGLES_SQL.strip()},
    {_minhash_sql().strip()},
    {_JACCARD_PAIRS_SQL.strip()},
    edges AS (
        SELECT c.doc_a AS a, c.doc_b AS b
        FROM candidates c
        JOIN jaccard_pairs j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
        WHERE j.jaccard >= {JACCARD_THRESHOLD}
    )
    SELECT e1.a AS doc_a, e1.b AS doc_b, e2.b AS doc_c
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    doc="The PRODUCTION twin of q_graph_triangles: same triangle kernel, "
    "but edges come from the MinHash+LSH candidate generator + exact-"
    "Jaccard verification (the q_dedup_minhash pipeline) instead of the "
    "O(n^2) all-pairs join — the only edge construction that exists at "
    "100 TB, where the exact join is infeasible by definition. The "
    "oracle replays the identical md5-seeded minhash banding in SQL, so "
    "the LSH path itself is adjudicated end-to-end; "
    "tests/test_components.py additionally asserts this query's output "
    "EQUALS the exact variant's on the fixtures (LSH pair-completeness "
    "is measured 1.0 there by q_dedup_blocking_quality — at the "
    "J≈threshold margin the banded recall bound 1-(1-J^r)^b applies and "
    "a missed edge removes its triangles, the documented production "
    "trade). Same a<b orientation, so each triangle lands exactly once "
    "as a<b<c; edge count tracks true near-dups, so both self-joins "
    "stay sparse.",
    tags=("graph", "dedup", "llm"),
)
def q_graph_triangles_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load(spark, sf_dir, "documents"))
    edges = materialize(
        neardup_pairs(docs).select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    return (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .select(
            F.col("e1.a").alias("doc_a"),
            F.col("e1.b").alias("doc_b"),
            F.col("e2.b").alias("doc_c"),
        )
    )


#: Sparsify the trade graph to each customer's top-K suppliers by trade
#: value before any neighborhood expansion: exact 2-hop enumeration over
#: the DENSE bipartite graph is inherently quadratic (measured: the raw
#: supplier-keyed self-join fans out to ~250M rows at sf0.1 because every
#: supplier serves hundreds of customers), and top-K sparsification is the
#: standard bound (the same degree-capping lever as stop-shingles).
KHOP_TOP_SUPPLIERS = 5


@register(
    "q_graph_khop",
    oracle=f"""
    WITH trade AS (
        SELECT o.o_custkey AS c, l.l_suppkey AS s,
               SUM(CAST(l.l_extendedprice AS DECIMAL(38,2))) AS v
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_custkey, l.l_suppkey
    ), ranked AS (
        SELECT c, s,
               ROW_NUMBER() OVER (PARTITION BY c ORDER BY v DESC, s) AS rn
        FROM trade
    ), edges AS (
        SELECT c, s FROM ranked WHERE rn <= {KHOP_TOP_SUPPLIERS}
    )
    SELECT p1.c AS custkey,
           COUNT(DISTINCT p1.s) AS n_suppliers,
           COUNT(DISTINCT CASE WHEN p2.c <> p1.c THEN p2.c END)
             AS n_2hop_customers
    FROM edges p1 JOIN edges p2 ON p1.s = p2.s
    GROUP BY p1.c
    """,
    doc="Two-hop neighborhood size per customer over the SPARSIFIED trade "
    "graph: each customer keeps only its top-"
    f"{KHOP_TOP_SUPPLIERS} suppliers by decimal-exact trade value "
    "(deterministic value-desc/suppkey tie-break), then one supplier-"
    "keyed self-join counts direct suppliers and the OTHER customers "
    "reachable through a shared top supplier — the collaborative-"
    "filtering / influence-radius shape. Sparsification is load-bearing, "
    "not cosmetic: the raw bipartite graph is DENSE (every supplier "
    "serves hundreds of customers), so exact 2-hop enumeration over it "
    "fans out quadratically (~250M join rows at sf0.1, measured) while "
    "saying nothing — every customer reaches every other. Top-K "
    "capping bounds the self-join at K x deg(s) per supplier and is the "
    "standard neighborhood-expansion bound (same degree-cap lever as "
    "q_dedup_minhash_stopshingle). The 2-hop distinct count uses the "
    "positional-BITMAP trick proven in q_agg_bitmap_distinct instead of "
    "COUNT(DISTINCT): neighbor ids bucket into 63-bit words, bit_or "
    "folds presence MAP-SIDE on the join output, and the count is a sum "
    "of popcounts — the post-join shuffle carries at most one BIGINT "
    "per (customer, 63-id block) instead of one row per distinct "
    "(customer, neighbor) pair, and the Expand that two COUNT(DISTINCT) "
    "aggregates force disappears (measured clean-window at sf0.1: "
    "4.02s -> 2.81s; sf1 decade row re-measured in SCALING.md, round "
    "8). n_suppliers is the edge "
    "degree, counted BEFORE the fan-out (edges are distinct (c,s) by "
    "the top-K row_number construction) and joined back on the same "
    "customer key the 2-hop agg shuffles on. The self-link (p2.c = "
    "p1.c) contributes a zero word, so single-customer suppliers still "
    "yield a row with n_2hop_customers = 0. At 100 TB: the trade "
    "rollup is map-side combined; the top-K window shuffles one row per "
    "(customer, supplier); residual top-K-list skew (a supplier in "
    "everyone's top K) is AQE skew-split territory.",
    tags=("graph", "join", "window"),
)
def q_graph_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from sales_data_pipeline_gcp_spark.functions.exact import dec
    from sales_data_pipeline_gcp_spark.operators.relational2 import BITMAP_WORD

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # NOTE (round 13): probe-side fan_out was measured here and REVERTED —
    # the trade rollup's map work (one decimal conversion + broadcast
    # probe) is too cheap to amortize a full-row keyless repartition
    # (interleaved A/B: 2.8 -> 3.1-4.2s), unlike the 5-product OLS shape.
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    trade = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.sum(dec("l_extendedprice", 2)).alias("v"))
    )
    w = W.partitionBy("c").orderBy(F.col("v").desc(), F.col("s").asc())
    edges = (
        trade.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KHOP_TOP_SUPPLIERS)
        .select("c", "s")
    )
    # degree = exact n_suppliers: edges carry one row per (c, s)
    degree = edges.groupBy(F.col("c").alias("custkey")).agg(
        F.count("*").alias("n_suppliers")
    )
    p1 = edges.alias("p1")
    p2 = edges.alias("p2")
    # bitmap words over the 2-hop neighbor ids: self-links fold to 0-bits
    words = (
        p1.join(p2, F.col("p1.s") == F.col("p2.s"))
        .select(
            F.col("p1.c").alias("custkey"),
            F.expr(f"`p2`.`c` div {BITMAP_WORD}").alias("word"),
            F.when(
                F.col("p2.c") != F.col("p1.c"),
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(`p2`.`c` % {BITMAP_WORD} AS INT))"
                ),
            )
            .otherwise(F.lit(0).cast("bigint"))
            .alias("bit"),
        )
        .groupBy("custkey", "word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    twohop = words.groupBy("custkey").agg(
        F.sum(F.bit_count("bits").cast("bigint")).alias("n_2hop_customers")
    )
    # every customer with edges self-matches in the join, so inner is total
    return degree.join(twohop, "custkey").select(
        "custkey", "n_suppliers", "n_2hop_customers"
    )


#: BFS hop cap for q_graph_sssp — bounds both the Spark iteration count and
#: the recursive-CTE depth so the two formulations compute the identical
#: "min-hop distance within SSSP_MAX_HOPS" relation.
SSSP_MAX_HOPS = 3


@register(
    "q_graph_sssp",
    oracle=f"""
    WITH RECURSIVE trade AS (
        SELECT o.o_custkey AS c, l.l_suppkey AS s,
               SUM(CAST(l.l_extendedprice AS DECIMAL(38,2))) AS v
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_custkey, l.l_suppkey
    ), ranked AS (
        SELECT c, s,
               ROW_NUMBER() OVER (PARTITION BY c ORDER BY v DESC, s) AS rn
        FROM trade
    ), edges AS (
        SELECT c, s FROM ranked WHERE rn <= {KHOP_TOP_SUPPLIERS}
    ), cc AS (
        SELECT DISTINCT p1.c AS a, p2.c AS b
        FROM edges p1 JOIN edges p2 ON p1.s = p2.s AND p1.c <> p2.c
    ), walk(c, d) AS (
        SELECT (SELECT MIN(c) FROM edges), 0
        UNION
        SELECT cc.b, walk.d + 1
        FROM walk JOIN cc ON cc.a = walk.c
        WHERE walk.d < {SSSP_MAX_HOPS}
    )
    SELECT c AS custkey, CAST(MIN(d) AS INTEGER) AS dist
    FROM walk GROUP BY c
    """,
    doc="Single-source BFS shortest hop distance (capped at "
    f"{SSSP_MAX_HOPS} hops) from the lowest-keyed customer over the "
    "customer-customer projection of the sparsified trade graph (same "
    "top-K-suppliers edge set as q_graph_khop, so the projection is "
    "degree-bounded). Spark side is the Pregel-style frontier loop: each "
    "round joins the previous frontier to the edge list, unions, and "
    "takes MIN(dist) per node, localCheckpoint-truncating lineage per "
    "round — the iteration count is the hop cap, a CONSTANT, never "
    "data-dependent driver control flow. Spark NEVER materializes the "
    "customer-customer projection the oracle's cc CTE builds: one "
    "projection hop is expanded as two bipartite hops (frontier -> its "
    "suppliers, distinct -> their customers), so per-round cost is two "
    "equi-joins against the degree-bounded EDGE list instead of a "
    "self-join whose output is quadratic in per-supplier degree — on a "
    "graph with hub suppliers the projection explodes while the "
    "bipartite expansion stays linear in edges, which is why this is "
    "the only BFS shape that survives 100 TB. The DuckDB oracle is a "
    "completely independent recursive-CTE formulation over the "
    "materialized projection, so the equivalence of the two graph "
    "representations is itself adjudicated. Frontier-only expansion "
    "(nodes at exactly d-1) keeps round cost proportional to the "
    "frontier, and the degree cap bounds the fan-out the way hub "
    "sparsification always must at scale.",
    tags=("graph", "iterative", "join"),
)
def q_graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from sales_data_pipeline_gcp_spark.functions.exact import dec

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice")
    trade = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.sum(dec("l_extendedprice", 2)).alias("v"))
    )
    w = W.partitionBy("c").orderBy(F.col("v").desc(), F.col("s").asc())
    edges = (
        trade.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KHOP_TOP_SUPPLIERS)
        .select("c", "s")
    )
    edges = materialize(edges, label="sssp_edges")
    # seed frontier: the lowest-keyed customer at distance 0, kept entirely
    # on the executors as a one-row DataFrame (no driver-side collect —
    # the seed is data, not control flow, so it never has to leave the JVM)
    dist = materialize(
        edges.agg(F.min("c").alias("c")).select("c", F.lit(0).cast("int").alias("d")),
        label="sssp_seed",
    )
    for r in range(1, SSSP_MAX_HOPS + 1):
        # one projection hop = two bipartite hops; the distinct supplier
        # frontier is bounded by the supplier dimension, never pair counts.
        # NOTE (round 13): explicit F.broadcast of the frontier sides was
        # measured here and REVERTED (interleaved A/B min 3.15 -> 3.51s):
        # the per-round driver-side broadcast builds cost more than the
        # AQE-planned joins they replaced — AQE already keeps these joins
        # cheap at bench scale, and at cluster scale the frontier-broadcast
        # decision belongs to AQE's runtime statistics anyway.
        sup = (
            dist.filter(F.col("d") == r - 1)
            .join(edges, "c")
            .select("s")
            .distinct()
        )
        frontier = sup.join(edges, "s").select("c", F.lit(r).alias("d"))
        dist = materialize(
            dist.unionByName(frontier).groupBy("c").agg(F.min("d").alias("d")),
            label="sssp_round",
        )
    return dist.select(F.col("c").alias("custkey"), F.col("d").cast("int").alias("dist"))
