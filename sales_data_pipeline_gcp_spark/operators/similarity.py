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

from sales_data_pipeline_gcp_spark.io import fan_out, load
from sales_data_pipeline_gcp_spark.operators.dedup import EMBED_DIM, _sql_dot, spark_dot
from sales_data_pipeline_gcp_spark.plans.registry import register

QUERY_VEC_ID = 0
TOP_K = 10
NUM_CELLS = 16
NPROBE = 3
#: k-NN join: every (vec_id % KNN_QUERY_MOD == 0) vector is a query.
KNN_QUERY_MOD = 100
KNN_K = 3


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


@register(
    "q_knn_join",
    oracle=f"""
    WITH qs AS (
        SELECT vec_id AS query_id, embedding AS qe FROM embeddings
        WHERE vec_id % {KNN_QUERY_MOD} = 0
    ), scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {_sql_dot('e.embedding', 'q.qe')}
                 / (SQRT({_sql_dot('e.embedding', 'e.embedding')})
                    * SQRT({_sql_dot('q.qe', 'q.qe')})) AS cosine
        FROM embeddings e CROSS JOIN qs q
        WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, rank, cosine FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored
    ) WHERE rank <= {KNN_K}
    """,
    doc=f"Batch k-NN JOIN (top-{KNN_K} neighbors for every query vector, "
    f"queries = vec_id % {KNN_QUERY_MOD} == 0) — the bulk retrieval shape "
    "(eval-set mining, hard-negative mining) vs q_sim_topk's single probe. "
    "The query batch is broadcast (bounded by construction), the corpus is "
    "scanned once, and the per-query top-k is a rank window partitioned by "
    "query — the only shuffle is corpus x |queries| scored rows hashed by "
    "query_id. At 100 TB you compose this with the IVF cell restriction "
    "(q_sim_ann_ivf) so each query scores only its probed cells; the brute "
    "variant here is the exact baseline of that composition.",
    tags=("similarity",),
)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") % KNN_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    # fan_out the corpus side: |corpus| x |queries| interpreted cosines
    # otherwise run on one input split (io.fan_out; guide §2.2)
    scored = (
        fan_out(e).crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cosine(F.col("embedding"), F.col("qe")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= KNN_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


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


_IVF_ORACLE = f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    cents AS (
        SELECT vec_id AS cell, embedding AS centroid
        FROM embeddings WHERE vec_id < {NUM_CELLS}
    ), assign_scored AS (
        SELECT e.vec_id, e.label, e.embedding, c.cell,
               {_sql_dot('e.embedding', 'c.centroid')}
                 / (SQRT({_sql_dot('e.embedding', 'e.embedding')})
                    * SQRT({_sql_dot('c.centroid', 'c.centroid')})) AS csim
        FROM embeddings e CROSS JOIN cents c
    ), assigned AS (
        SELECT vec_id, label, embedding, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY csim DESC, cell ASC) AS rn
            FROM assign_scored
        ) WHERE rn = 1
    ), probed AS (
        SELECT cell FROM (
            SELECT c.cell,
                   {_sql_dot('c.centroid', 'qe')}
                     / (SQRT({_sql_dot('c.centroid', 'c.centroid')})
                        * SQRT({_sql_dot('qe', 'qe')})) AS csim
            FROM cents c CROSS JOIN q
        ) ORDER BY csim DESC, cell ASC LIMIT {NPROBE}
    )
    SELECT a.vec_id, a.label,
           {_sql_dot('a.embedding', 'qe')}
             / (SQRT({_sql_dot('a.embedding', 'a.embedding')})
                * SQRT({_sql_dot('qe', 'qe')})) AS cosine
    FROM assigned a JOIN probed USING (cell) CROSS JOIN q
    WHERE a.vec_id <> {QUERY_VEC_ID}
    ORDER BY cosine DESC, a.vec_id ASC
    LIMIT {TOP_K}
    """


@register(
    "q_sim_ann_ivf",
    oracle=_IVF_ORACLE,
    doc=f"IVF-style ANN: {NUM_CELLS} coarse cells seeded from the first "
    f"{NUM_CELLS} vectors (deterministic, training-free); every vector is "
    f"assigned to its nearest cell, the query probes the {NPROBE} nearest "
    "cells, and only those cells are exactly re-ranked (~20% of the corpus "
    "here). Centroids/probe list are broadcast — at 100 TB the corpus is "
    "hash-partitioned by cell so a probe touches nprobe/cells of the data. "
    "Recall@k asserted >= 0.9 in tests/test_similarity.py. PROMOTED to a "
    "full oracle in round 2: the whole pipeline is deterministic "
    "(training-free centroids, bit-identical cosines, value-deterministic "
    "tie-breaks), so DuckDB replays assignment + probing + re-rank exactly "
    "— an 'approximate' operator adjudicated bit-for-bit.",
    tags=("similarity",),
)
def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qe"))
    cents = (
        e.filter(F.col("vec_id") < NUM_CELLS)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("centroid"))
    )
    # fan_out the corpus branch: the per-vector argmax over all centroids
    # (interpreted HOFs) otherwise runs on one input split (io.fan_out)
    assigned = ivf_assign(fan_out(e), cents)

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


# --- embedding post-processing: quantization and k-means ------------------

#: number of k-means clusters; centroids seeded from the first K vectors
#: (deterministic, training-free — same convention as the IVF coarse cells).
KMEANS_K = 8
#: int8-style quantization range [0, QUANT_LEVELS].
QUANT_LEVELS = 255


@register(
    "q_embed_quantize",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
               CAST(UNNEST(embedding) AS DOUBLE) AS val
        FROM embeddings
    ), dims AS (
        SELECT dim, MIN(val) AS dmin, MAX(val) AS dmax FROM ex GROUP BY dim
    ), coded AS (
        SELECT ex.vec_id, ex.dim,
               CASE WHEN d.dmax = d.dmin THEN 0
                    ELSE CAST(LEAST(CAST({QUANT_LEVELS} AS BIGINT),
                              CAST(FLOOR(((ex.val - d.dmin) * CAST({QUANT_LEVELS} AS DOUBLE))
                                         / (d.dmax - d.dmin)) AS BIGINT)) AS INTEGER)
               END AS code
        FROM ex JOIN dims d USING (dim)
    )
    SELECT vec_id, CAST(COUNT(*) AS INTEGER) AS n_dims,
           string_agg(CAST(code AS VARCHAR), ',' ORDER BY dim) AS codes
    FROM coded GROUP BY vec_id
    """,
    doc=f"Per-dimension affine int8 quantization of the embedding column "
    f"(codes 0..{QUANT_LEVELS}, dequant = dmin + code/{QUANT_LEVELS}*(dmax-dmin)) "
    "— the storage-compression step before ANN indexing. The per-dim "
    "min/max stats are one 64-row aggregate; quantization itself is "
    "IN-ROW: the stats collapse to a single array-of-structs row, "
    "broadcast, and an indexed transform() codes all 64 dims without "
    "exploding the corpus — at 100 TB the vectors are never unrolled, "
    "never shuffled (the oracle's explode+regroup shows the naive "
    "equivalent). floor() instead of round() avoids cross-engine "
    "half-way rounding divergence; codes serialize as CSV (driver "
    "canonicalizer cannot hash list cells).",
    tags=("similarity", "embedding"),
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(F.posexplode("embedding").alias("pos", "fval")).select(
        (F.col("pos") + 1).alias("dim"), F.col("fval").cast("double").alias("val")
    )
    dims = ex.groupBy("dim").agg(F.min("val").alias("dmin"), F.max("val").alias("dmax"))
    dims_row = dims.agg(
        F.sort_array(F.collect_list(F.struct("dim", "dmin", "dmax"))).alias("stats")
    )

    def code(x, i):
        st = F.col("stats")[i]
        dmin, dmax = st["dmin"], st["dmax"]
        q = F.least(
            F.lit(QUANT_LEVELS).cast("bigint"),
            F.floor((x.cast("double") - dmin) * F.lit(float(QUANT_LEVELS)) / (dmax - dmin)),
        ).cast("int")
        return F.when(dmax == dmin, F.lit(0)).otherwise(q)

    return (
        e.crossJoin(F.broadcast(dims_row))
        .select("vec_id", F.transform(F.col("embedding"), code).alias("codes_arr"))
        .select(
            "vec_id",
            F.size("codes_arr").cast("int").alias("n_dims"),
            F.concat_ws(",", F.transform(F.col("codes_arr"), lambda c: c.cast("string"))).alias("codes"),
        )
    )


@register(
    "q_kmeans_iter",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cell, embedding AS centroid
        FROM embeddings WHERE vec_id < {KMEANS_K}
    ), assign_scored AS (
        SELECT e.vec_id, e.embedding, c.cell,
               {_sql_dot('e.embedding', 'c.centroid')}
                 / (SQRT({_sql_dot('e.embedding', 'e.embedding')})
                    * SQRT({_sql_dot('c.centroid', 'c.centroid')})) AS csim
        FROM embeddings e CROSS JOIN cents c
    ), assigned AS (
        SELECT vec_id, embedding, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY csim DESC, cell ASC) AS rn
            FROM assign_scored
        ) WHERE rn = 1
    ), exploded AS (
        SELECT cell, generate_subscripts(embedding, 1) AS dim,
               CAST(UNNEST(embedding) AS DOUBLE) AS val
        FROM assigned
    )
    SELECT cell, CAST(dim AS INTEGER) AS dim,
           COUNT(*) AS n_members,
           CAST(CAST(SUM(CAST(val AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)
             / COUNT(*) AS mean_val
    FROM exploded GROUP BY cell, dim
    """,
    doc=f"One Lloyd iteration of k-means (k={KMEANS_K}, centroids seeded "
    "from the first k vectors): assign every vector to its nearest "
    "centroid by cosine (the in-row broadcast argmax of ivf_assign — no "
    "per-vector shuffle), then recompute per-cluster per-dimension means. "
    "The mean is an exact decimal sum divided by the count, so the new "
    "centroids are bit-identical cross-engine — which is what makes an "
    "ITERATIVE algorithm adjudicable: every subsequent iteration sees "
    "the same input. At 100 TB each iteration is one narrow map "
    "(assignment) + one k*64-group aggregate with map-side combine; the "
    "explode is of the ASSIGNED rows only and collapses immediately.",
    tags=("similarity", "embedding"),
)
def q_kmeans_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sales_data_pipeline_gcp_spark.functions.exact import dec

    e = load(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("centroid")
    )
    # fan_out the corpus branch (io.fan_out): assignment argmax + the
    # 64-way posexplode otherwise run on one input split; the per-cell
    # decimal mean is order-independent
    assigned = ivf_assign(fan_out(e), cents)
    exploded = assigned.select(
        "cell", F.posexplode("embedding").alias("pos", "fval")
    ).select(
        "cell",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("fval").cast("double").alias("val"),
    )
    return exploded.groupBy("cell", "dim").agg(
        F.count("*").alias("n_members"),
        (F.sum(dec(F.col("val"), 8)).cast("string").cast("double") / F.count("*")).alias("mean_val"),
    )


# --- product quantization (PQ) with asymmetric distance computation -------

#: PQ geometry: EMBED_DIM (64) = PQ_M subspaces x PQ_SUBDIM dims; one
#: codebook of PQ_K entries per subspace, seeded from the first PQ_K
#: vectors' sub-vectors (training-free deterministic, same convention as
#: the IVF coarse cells / k-means seeds).
PQ_M = 8
PQ_SUBDIM = 8
PQ_K = 16
PQ_TOPK = 10


def _sql_l2sq(a: str, b: str) -> str:
    """Fixed-order squared-L2 over two PQ_SUBDIM-dim lists (DuckDB)."""
    return (
        f"list_sum(list_transform(range(1, {PQ_SUBDIM + 1}), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        f" * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
    )


def _spark_l2sq(a, b):
    """Sequential squared-L2 — identical fold order to ``_sql_l2sq``."""
    d = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


_PQ_ORACLE = f"""
    WITH ms AS (SELECT UNNEST(range(0, {PQ_M})) AS m),
    subs AS (
        SELECT e.vec_id, ms.m,
               e.embedding[ms.m * {PQ_SUBDIM} + 1 : ms.m * {PQ_SUBDIM} + {PQ_SUBDIM}] AS sub
        FROM embeddings e CROSS JOIN ms
    ),
    cb AS (SELECT vec_id AS k, m, sub FROM subs WHERE vec_id < {PQ_K}),
    qsubs AS (SELECT m, sub AS qsub FROM subs WHERE vec_id = {QUERY_VEC_ID}),
    encoded AS (
        SELECT vec_id, m, k, sub FROM (
            SELECT s.vec_id, s.m, c.k, c.sub,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                      ORDER BY {_sql_l2sq('s.sub', 'c.sub')} ASC, c.k ASC) AS rn
            FROM subs s JOIN cb c ON s.m = c.m
        ) WHERE rn = 1
    ),
    adc AS (
        SELECT en.vec_id, en.m, en.k,
               CAST({_sql_l2sq('q.qsub', 'en.sub')} AS DECIMAL(24,12)) AS qd
        FROM encoded en JOIN qsubs q ON en.m = q.m
    )
    SELECT a.vec_id, e.label,
           string_agg(CAST(a.k AS VARCHAR), ',' ORDER BY a.m) AS codes,
           CAST(SUM(a.qd) AS DOUBLE) AS approx_l2
    FROM adc a JOIN embeddings e ON e.vec_id = a.vec_id
    WHERE a.vec_id <> {QUERY_VEC_ID}
    GROUP BY a.vec_id, e.label
    ORDER BY approx_l2 ASC, a.vec_id ASC
    LIMIT {PQ_TOPK}
    """


@register(
    "q_sim_pq_adc",
    oracle=_PQ_ORACLE,
    doc=f"Product-quantization ANN (Jegou et al. PQ, the IVF-PQ index "
    f"shape minus the coarse level): the {EMBED_DIM}-dim embedding splits "
    f"into {PQ_M} x {PQ_SUBDIM}-dim subspaces, each encoded as the argmin "
    f"of squared-L2 against a {PQ_K}-entry codebook (seeded from the first "
    f"{PQ_K} vectors — training-free deterministic, the q_kmeans_iter loop "
    "is how you'd train them); query distance is asymmetric (ADC): the "
    "sum over subspaces of dist(query sub-vector, assigned codebook "
    "entry). Encoding is fully IN-ROW — codebooks collapse to one "
    "broadcast array-of-structs row and each vector computes its "
    f"{PQ_M} codes with nested higher-order functions, so the corpus is "
    "never exploded or shuffled; at 100 TB vectors store as "
    f"{PQ_M} bytes instead of {EMBED_DIM} floats (32x) and ADC scans "
    "read codes only. Per-subspace distances quantize to DECIMAL(24,12) "
    "before the cross-subspace sum, so the total is order-independent "
    "and bit-identical to the oracle's explode+regroup equivalent. "
    f"Codegen note: the {PQ_M} subspaces are deliberately unrolled into "
    f"{PQ_M} separate projected columns instead of one "
    "transform-over-sequence expression — the fused form generated a "
    "method so large HotSpot's JIT compile threshold (8 KB bytecode) "
    "randomly declined it, giving 4.0-11.5s cross-JVM dispersion on the "
    "same plan (round-6 VERDICT item 3 / BENCH_NOTES); per-subspace "
    "columns keep every generated method JIT-compilable, same results "
    "bit-for-bit (identical fold order and decimal casts).",
    tags=("similarity", "embedding"),
)
def q_sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    cb = (
        e.filter(F.col("vec_id") < PQ_K)
        .select(
            F.col("vec_id").alias("k"),
            F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m"),
            "embedding",
        )
        .select("k", "m", F.slice("embedding", F.col("m") * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sub"))
    )
    cb_row = cb.agg(F.collect_list(F.struct("m", "k", "sub")).alias("cbs"))
    q_row = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qe"))

    # fan_out the corpus branch only (codebook/query rows stay scan-direct):
    # the in-row PQ encoding (8 subspaces x 16-entry codebook scans in
    # interpreted higher-order functions) is the dominant CPU and otherwise
    # runs on ONE input split (io.fan_out; guide §2.2) — per-row map +
    # deterministic global top-K, so partitioning cannot change the result
    df = (
        fan_out(e.filter(F.col("vec_id") != QUERY_VEC_ID))
        .crossJoin(F.broadcast(cb_row))  # single-row: replication factor 1
        .crossJoin(F.broadcast(q_row))
    )
    # one narrow column per subspace: each expression (16-entry codebook
    # scan over an 8-dim zip_with/aggregate) generates its own modest
    # methods, all below the JIT compile/inline thresholds. The PQ_M
    # columns are built as SQL STRINGS in one selectExpr (round 13,
    # VERDICT item 7): the per-subspace Column/lambda builder loop cost
    # ~1.4s of py4j round trips per fn build — inside the timed region on
    # every run — while the string form builds the IDENTICAL expressions
    # (same schema, rows verified equal, same unrolled-plan JIT layout)
    # in ~0.25s. The array_min struct's field order (dist, k, sub) is
    # load-bearing: struct comparison is lexicographic, so min = nearest
    # entry with ties broken by lowest k.
    def _sql_l2sq(a: str, b: str) -> str:
        # sequential squared-L2, same fold order as _spark_l2sq/_sql_l2sq
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> "
            "(cast(x as double) - cast(y as double)) * "
            "(cast(x as double) - cast(y as double))), "
            "cast(0.0 as double), (acc, x) -> acc + x)"
        )

    pq_cols = []
    for m in range(PQ_M):
        vsub = f"slice(embedding, {m * PQ_SUBDIM + 1}, {PQ_SUBDIM})"
        qsub = f"slice(qe, {m * PQ_SUBDIM + 1}, {PQ_SUBDIM})"
        best = (
            f"array_min(transform(filter(cbs, c -> c.m = {m}), "
            f"c -> named_struct('dist', {_sql_l2sq(vsub, 'c.sub')}, "
            "'k', c.k, 'sub', c.sub)))"
        )
        # decimal(24,12): addition widens to (25,12) — never past 38,
        # so the fold is EXACT (a (38,12) accumulator would overflow
        # on add and silently shed scale digits)
        pq_cols.append(
            f"named_struct('code', {best}.k, "
            f"'qd', cast({_sql_l2sq(qsub, best + '.sub')} as decimal(24,12))) as _pq{m}"
        )
    df = df.selectExpr("vec_id", "label", *pq_cols)
    # same left-fold order and per-step decimal cast as the fused form
    approx = "cast(0 as decimal(24,12))"
    for m in range(PQ_M):
        approx = f"cast(({approx} + _pq{m}.qd) as decimal(24,12))"
    codes = (
        "concat_ws(',', "
        + ", ".join(f"cast(_pq{m}.code as string)" for m in range(PQ_M))
        + ")"
    )
    return (
        df.selectExpr(
            "vec_id",
            "label",
            f"{codes} as codes",
            f"cast({approx} as double) as approx_l2",
        )
        .orderBy(F.col("approx_l2").asc(), F.col("vec_id").asc())
        .limit(PQ_TOPK)
    )
