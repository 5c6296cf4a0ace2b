"""Deduplication family for LLM training-data pipelines (SURVEY.md §2.4):

- exact content dedup (hash-groupBy),
- n-gram-shingle Jaccard near-dup (explode + band join, fully SQL),
- MinHash+LSH near-dup (shingle -> k minhashes -> banded bucket join ->
  exact-Jaccard verification),
- SimHash near-dup (token bit-vote -> chunk-blocked hamming join),
- embedding-cosine near-dup (label-blocked brute pairs).

All five are declared queries WITH oracles: the hash family
(functions/hashing.py) is computable identically in DuckDB, so even the
probabilistic pipelines are bit-reproducible cross-engine.

Scale design: every pipeline is explode -> shuffle-on-key -> agg/join, no
driver-side state. The LSH band join is the 100 TB path (candidates only,
no O(n^2)); the plain Jaccard join exists as the exact baseline and for
verification of LSH candidates. Skewed shingles (stop-shingles shared by
half the corpus) are the known hazard — AQE skew-join handles moderate
skew, and a production run would drop top-frequency shingles first (same
idea as stopword removal).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.functions.hashing import (
    shared_hash,
    shared_hash32,
    sql_shared_hash,
    sql_shared_hash32,
)
from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.plans.registry import register

# ---------------------------------------------------------------------------
# shared derivations
# ---------------------------------------------------------------------------

#: MinHash parameters: k = NUM_BANDS * ROWS_PER_BAND signature length.
#: With r=2, b=8: P(candidate | J) = 1-(1-J^2)^8 -> 0.9 at J=0.5.
NUM_BANDS = 8
ROWS_PER_BAND = 2
NUM_HASHES = NUM_BANDS * ROWS_PER_BAND

JACCARD_THRESHOLD = 0.5
SHINGLE_WORDS = 3

#: SimHash: 32-bit fingerprint, blocked on 4 x 8-bit chunks -> pairs with
#: hamming distance <= 3 are guaranteed to share at least one chunk.
SIMHASH_BITS = 32
SIMHASH_CHUNKS = 4
HAMMING_MAX = 3

_WORDS_SQL = "list_filter(string_split(text, ' '), w -> w <> '')"

# doc_id -> exploded DISTINCT 3-word shingles (rows: doc_id, shingle)
_SHINGLES_SQL = f"""
words AS (
    SELECT doc_id, {_WORDS_SQL} AS ws FROM documents
),
shingles AS (
    SELECT doc_id,
           UNNEST(list_distinct(list_transform(
               range(1, len(ws) - {SHINGLE_WORDS - 2}),
               i -> array_to_string(ws[i:i+{SHINGLE_WORDS - 1}], ' ')))) AS shingle
    FROM words
    WHERE len(ws) >= {SHINGLE_WORDS}
)
"""


# fan_out moved to io.py (round 12) so every operator family can use it;
# re-exported here for the existing dedup/corpus/components import sites.
from sales_data_pipeline_gcp_spark.io import fan_out  # noqa: F401,E402

#: execution-order counter for SPARK_GRAFT_PLAN_DUMP_DIR checkpoint dumps.
_PLAN_DUMP_SEQ = 0


def materialize(df: DataFrame, label: str | None = None) -> DataFrame:
    """Cut a reused subtree out of every downstream branch: eager
    ``localCheckpoint`` computes it ONCE and replaces the lineage with the
    stored partitions. Spark does no cross-branch subtree reuse, so without
    this the LSH self-joins execute the signature stage on BOTH sides and
    the verify joins re-derive the shingle stage — the most expensive
    stage of the pipeline running 2-6x (the round-2 bench outlier's
    structural amplifier).

    Plan evidence for iterative operators (round-12 VERDICT item 6): a
    checkpoint REPLACES lineage, so a final ``explain`` of a loop's result
    is a vacuous 3-node scan of the last checkpoint. When
    ``SPARK_GRAFT_PLAN_DUMP_DIR`` is set, every materialize dumps the
    PRE-checkpoint formatted plan of the subtree it is about to compute —
    numbered in execution order, tagged with ``label`` where the caller
    passes one — which is exactly the per-iteration loop-body plan
    (tools/dump_plans.py --iter drives this).

    Scale note: everything checkpointed in the minhash pipeline is one row
    per DOC (shingle arrays, k-long signatures) — never the corpus-sized
    exploded occurrence stream (round-4 restructure; checkpointing the
    exploded stream more than doubled wall time at sf0.1). On a real
    cluster ``checkpoint()`` to HDFS/object storage survives executor loss;
    localCheckpoint is the single-node analog."""
    dump_dir = os.environ.get("SPARK_GRAFT_PLAN_DUMP_DIR")
    if dump_dir:
        import contextlib
        import io

        global _PLAN_DUMP_SEQ
        _PLAN_DUMP_SEQ += 1
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        os.makedirs(dump_dir, exist_ok=True)
        tag = f"{_PLAN_DUMP_SEQ:02d}" + (f"_{label}" if label else "")
        with open(os.path.join(dump_dir, f"ckpt_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
    return df.localCheckpoint(eager=True)


def shingle_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, shs) with the doc's DISTINCT 3-word shingles as an IN-ROW
    array — the un-exploded form, for stages (minhash signatures) that can
    fold per-doc without ever shuffling the shingle stream.

    The sequence bound is clamped with greatest(..., 1) so the expression
    is TOTAL: Spark's sequence(1, 0) generates DESCENDING [1, 0] (not
    empty) and slice(arr, 0, n) then errors — and the size>=3 filter
    here cannot be relied on to short-circuit, because downstream
    explodes infer a size(shs)>0 predicate that CombineFilters merges
    into one conjunction whose codegen CSE evaluates the shingle
    subexpression before the guard. Clamped short-doc rows produce a
    garbage 1-element value that the filter then drops."""
    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))
    docs = docs.select("doc_id", ws.alias("ws")).filter(F.size("ws") >= SHINGLE_WORDS)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size("ws") - (SHINGLE_WORDS - 1), F.lit(1))
            ),
            lambda i: F.concat_ws(" ", F.slice(F.col("ws"), i, SHINGLE_WORDS)),
        )
    )
    return docs.select("doc_id", shingles.alias("shs"))


def shingles_from(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) exploded distinct shingles — DataFrame twin of
    ``_SHINGLES_SQL``; the form pairwise-verification joins need."""
    return shingle_arrays(docs).select("doc_id", F.explode("shs").alias("shingle"))


def doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shingles_from(fan_out(load(spark, sf_dir, "documents")))


_JACCARD_PAIRS_SQL = f"""
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
    FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
jaccard_pairs AS (
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
)
"""


def jaccard_pairs(sh: DataFrame, *, shs_arrays: DataFrame | None = None) -> DataFrame:
    """All-pairs shingle Jaccard from an exploded (doc_id, shingle) set —
    DataFrame twin of ``_JACCARD_PAIRS_SQL``.

    The shingle-keyed self-join IS the candidate generation and must run
    on the exploded stream; but the per-doc sizes are an in-row ``F.size``
    over the ARRAY table when the caller has one (``shs_arrays``,
    round 13) — identical values (one exploded row per distinct shingle),
    one full occurrence-stream groupBy shuffle removed (guide §2.4)."""
    sizes = (
        shs_arrays.select("doc_id", F.size("shs").alias("n"))
        if shs_arrays is not None
        else sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    )
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
    )


# ---------------------------------------------------------------------------
# 1. exact dedup
# ---------------------------------------------------------------------------


@register(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text)   AS fingerprint,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*)    AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    doc="Exact content dedup: hash-groupBy on md5(text), deterministic "
    "survivor = min doc_id. One shuffle on the fingerprint; at 100 TB this "
    "is the cheapest dedup and always runs first.",
    tags=("dedup",),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# 2. n-gram Jaccard near-dup (exact baseline)
# ---------------------------------------------------------------------------


@register(
    "q_dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_SQL.strip()},
    {_JACCARD_PAIRS_SQL.strip()}
    SELECT doc_a, doc_b, jaccard
    FROM jaccard_pairs
    WHERE jaccard >= {JACCARD_THRESHOLD}
    """,
    doc="Exact n-gram (3-word shingle) Jaccard near-dup pairs: explode "
    "distinct shingles, self-join on shingle, |A-and-B| / (|A|+|B|-|A-and-B|). "
    "Exact but fan-out-bound — the MinHash variant is the scale path.",
    tags=("dedup",),
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # checkpoint the |docs|-row ARRAY table (doc-granular discipline; the
    # exploded stream is derived lazily — the self-join's two sides share
    # one exchange via ReusedExchange) and take per-doc sizes in-row
    shs = materialize(shingle_arrays(fan_out(load(spark, sf_dir, "documents"))))
    sh = shs.select("doc_id", F.explode("shs").alias("shingle"))
    return jaccard_pairs(sh, shs_arrays=shs).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )


# ---------------------------------------------------------------------------
# 3. MinHash + LSH near-dup (the scale path)
# ---------------------------------------------------------------------------


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """doc_id -> mh_0..mh_{k-1}: min over shingles of k derived hashes.

    **Derived hash family** (Kirsch-Mitzenmacher double hashing): only TWO
    32-bit base md5s per occurrence; function i is ``b1 + i*b2``
    (max < 2^32 * k — no ANSI overflow). Pairwise independence of the
    family is what MinHash's collision-probability argument needs, and
    2 md5s vs k is an 8x cut of the pipeline's dominant CPU cost.

    The bases are computed INLINE per occurrence row — a map-side-only
    projection inside whole-stage codegen — and all k mins fold in one
    partially-aggregated groupBy: one shuffle, keyed by doc_id, carrying
    k longs per doc after map-side combine. (An in-row variant — per-doc
    shingle array, zip_with + array_min folds — was measured SLOWER:
    higher-order functions are evaluated interpreted, outside codegen,
    and the per-function array allocations cost more than this stage's
    small combined shuffle.)

    The tempting alternative (dictionary-encode: hash each DISTINCT shingle
    once globally, join back) is strictly worse at scale: the dictionary is
    unbounded at 100 TB so it cannot be broadcast, and a shuffle join on
    the shingle key moves the whole occurrence stream through an extra
    exchange just to save re-hashing — md5 per row is cheaper than a
    shuffle per row, and the scale deployment swaps in xxhash64 anyway
    (functions/hashing.py scale note)."""
    hashed = sh.select(
        "doc_id",
        shared_hash32(F.col("shingle"), "mh:a:").alias("b1"),
        shared_hash32(F.col("shingle"), "mh:b:").alias("b2"),
    )
    # ONE named_struct aggregate expression + field unpack instead of a
    # NUM_HASHES-Column builder loop (round 13, VERDICT item 7): the k
    # min-aggregates and their arithmetic are IDENTICAL (verified: same
    # schema, same aggregate plan modulo one trivial unpack Project, equal
    # rows), but plan construction drops from ~50 py4j round trips to 2 —
    # ~0.25s of per-run fn-construction cost paid by every minhash-family
    # query. The 8KB-JIT-method rationale is untouched: codegen sees the
    # same k aggregate expressions either way.
    struct_sql = (
        "named_struct("
        + ", ".join(f"'mh_{i}', min(b1 + {i} * b2)" for i in range(NUM_HASHES))
        + ")"
    )
    return (
        hashed.groupBy("doc_id")
        .agg(F.expr(struct_sql).alias("__sig"))
        .select("doc_id", "__sig.*")
    )


def lsh_candidate_pairs(sig: DataFrame) -> DataFrame:
    """Band the signature (b bands x r rows), bucket-join per band, distinct
    candidate pairs. Only same-bucket docs ever meet — no O(n^2).

    Banding is ONE posexplode over an array of bucket keys, not a b-way
    union: a union re-executes the whole signature pipeline once per band
    (Spark does no cross-branch subtree reuse), an explode scans it once."""
    # single selectExpr instead of a per-band Column builder loop — same
    # md5(concat_ws(cast..)) expressions, 2 py4j calls instead of ~40
    # (round 13, VERDICT item 7; rows verified equal)
    band_exprs = ", ".join(
        "md5(concat_ws(',', "
        + ", ".join(
            f"cast(mh_{band * ROWS_PER_BAND + r} as string)"
            for r in range(ROWS_PER_BAND)
        )
        + "))"
        for band in range(NUM_BANDS)
    )
    exploded = sig.selectExpr(
        "doc_id", f"posexplode(array({band_exprs})) as (band, bucket)"
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _minhash_sql_over(source: str) -> str:
    """Signature/banding/candidate CTE chain over a (doc_id, shingle)
    source CTE — parameterized so the stop-shingle variant can run the
    identical chain over its filtered shingle set."""
    b1 = sql_shared_hash32("shingle", "mh:a:")
    b2 = sql_shared_hash32("shingle", "mh:b:")
    mins = ",\n           ".join(
        f"MIN({b1} + {i} * {b2}) AS mh_{i}" for i in range(NUM_HASHES)
    )
    band_rows = []
    for band in range(NUM_BANDS):
        cols = ", ".join(
            f"CAST(mh_{band * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        band_rows.append(
            f"SELECT doc_id, {band} AS band, md5(concat_ws(',', {cols})) AS bucket FROM sig"
        )
    bands = "\n        UNION ALL\n        ".join(band_rows)
    return f"""
    sig AS (
        SELECT doc_id,
           {mins}
        FROM {source} GROUP BY doc_id
    ),
    bands AS (
        {bands}
    ),
    candidates AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    """


def _minhash_sql() -> str:
    return _minhash_sql_over("shingles")


def verify_jaccard(cand: DataFrame, shs: DataFrame) -> DataFrame:
    """Exact Jaccard computed ONLY for candidate pairs — the LSH contract:
    all-pairs verification never happens.

    Round-4 restructure (the round-3 cost leader's fix): verification joins
    the candidate pairs to the per-doc shingle ARRAY table (one row per
    doc) and computes ``|A ∩ B|`` IN-ROW via ``array_intersect`` — all
    JVM codegen, no Python. The previous shape re-joined the corpus-sized
    EXPLODED shingle stream twice per verification and re-aggregated,
    which (a) forced the exploded stream to be materialized for reuse and
    (b) concentrated hot-shingle skew into the verify join — the exact
    hazard VERDICT r3 flagged. The array table is |docs| rows (tiny
    relative to the occurrence stream); at 100 TB the joins shuffle on
    doc_id — perfectly uniform keys — or broadcast under AQE when the
    candidate set is small."""
    a = shs.select(F.col("doc_id").alias("__ja"), F.col("shs").alias("shs_a"))
    b = shs.select(F.col("doc_id").alias("__jb"), F.col("shs").alias("shs_b"))
    inter = F.size(F.array_intersect("shs_a", "shs_b"))
    return (
        cand.join(a, F.col("doc_a") == F.col("__ja"))
        .join(b, F.col("doc_b") == F.col("__jb"))
        .select(
            "doc_a",
            "doc_b",
            (
                inter.cast("double")
                / (F.size("shs_a") + F.size("shs_b") - inter)
            ).alias("jaccard"),
        )
    )


#: hot-set cardinality above which the broadcast ``array_except`` path
#: gives way to the exploded ``left_anti`` path: a broadcast hot-set is one
#: task's memory, and ~100k shingles x ~40 bytes ≈ 4 MB is a conservative
#: ceiling well under any executor's broadcast budget.
STOP_SHINGLE_BROADCAST_BUDGET = 100_000


def drop_stop_shingles(
    shs: DataFrame,
    max_df: int | None = None,
    *,
    max_df_frac: float | None = None,
    broadcast_budget: int = STOP_SHINGLE_BROADCAST_BUDGET,
) -> DataFrame:
    """Remove shingles occurring in more documents than a threshold before
    hashing — the stop-shingle drop (module docstring): boilerplate
    shingles shared by a large corpus fraction put a quadratic number of
    pairs into one LSH band bucket and dominate every band, which is THE
    skew hazard of shingle pipelines at 100 TB (same idea as stopword
    removal; AQE skew-join only mitigates moderate skew).

    Threshold semantics (round-4 ADVICE fix): ``max_df`` is an ABSOLUTE
    document count. Under Zipfian shingle distributions the ``df > k`` set
    grows roughly linearly with corpus size, so an absolute count is a
    small-corpus convenience, not the scale policy — pass ``max_df_frac``
    instead to set the threshold to ``ceil(frac * |docs|)`` (|docs| comes
    from a broadcast single-row count, computed relationally), which keeps
    the hot set genuinely small by construction at any corpus size.

    The removal path adapts to the hot set's cardinality — decided by one
    ``count()`` over the already-aggregated (and checkpointed) hot-shingle
    relation, a runtime-statistics scheduling decision in the AQE mold,
    not a data-path collect:

    - ``<= broadcast_budget``: fold the hot set to ONE array broadcast to
      every task; removal is an in-row ``array_except`` — zero extra
      corpus shuffles.
    - ``> broadcast_budget``: explode the arrays, ``left_anti`` join
      against the hot relation (a shuffle join that scales with hot-set
      size instead of concentrating it in a single task's memory), and
      re-aggregate per doc. Two corpus shuffles, correct at any size.

    Both paths are equivalence-tested (tests/test_dedup_property.py); docs
    whose every shingle is hot are dropped by both."""
    if (max_df is None) == (max_df_frac is None):
        raise ValueError("pass exactly one of max_df / max_df_frac")
    counts = (
        shs.select(F.explode("shs").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count("*").alias("df"))
    )
    if max_df is not None:
        hot_rel = counts.filter(F.col("df") > max_df)
    else:
        n_docs = shs.agg(F.count("*").alias("__n"))
        hot_rel = (
            counts.join(F.broadcast(n_docs))
            .filter(F.col("df") > F.ceil(F.lit(max_df_frac) * F.col("__n")))
        )
    hot_rel = materialize(hot_rel.select("shingle"))
    if hot_rel.count() <= broadcast_budget:
        hot = hot_rel.agg(F.collect_set("shingle").alias("__hot"))
        return (
            shs.join(F.broadcast(hot))
            .select(
                "doc_id",
                F.array_except("shs", F.coalesce("__hot", F.array())).alias("shs"),
            )
            .filter(F.size("shs") > 0)
        )
    kept = (
        shs.select("doc_id", F.explode("shs").alias("shingle"))
        .join(hot_rel, "shingle", "left_anti")
    )
    return kept.groupBy("doc_id").agg(F.collect_set("shingle").alias("shs"))


def neardup_pairs(docs: DataFrame, *, stop_shingle_df: int | None = None) -> DataFrame:
    """Verified near-dup pairs (doc_a < doc_b, jaccard >= threshold): the
    shared MinHash+LSH pipeline behind q_dedup_minhash, the cluster query,
    and the corpus funnel.

    Materialization contract: the per-doc shingle ARRAY table feeds the
    signature stage and both verify branches — checkpointed once at |docs|
    rows (NOT the corpus-sized exploded stream, which now exists only
    transiently inside the signature aggregation). ``sig`` feeds both
    sides of the band self-join — checkpointed at |docs| x k longs."""
    shs = materialize(shingle_arrays(docs))
    if stop_shingle_df is not None:
        shs = materialize(drop_stop_shingles(shs, stop_shingle_df))
    exploded = shs.select("doc_id", F.explode("shs").alias("shingle"))
    sig = materialize(minhash_signatures(exploded))
    cand = lsh_candidate_pairs(sig)
    return verify_jaccard(cand, shs).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


@register(
    "q_dedup_minhash",
    oracle=f"""
    WITH {_SHINGLES_SQL.strip()},
    {_minhash_sql().strip()},
    {_JACCARD_PAIRS_SQL.strip()}
    SELECT c.doc_a, c.doc_b, j.jaccard
    FROM candidates c
    JOIN jaccard_pairs j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
    WHERE j.jaccard >= {JACCARD_THRESHOLD}
    """,
    doc=f"MinHash+LSH near-dup: {NUM_HASHES} seeded minhashes (shared md5 "
    f"hash family -> bit-reproducible in the oracle), {NUM_BANDS} bands x "
    f"{ROWS_PER_BAND} rows banding, bucket-join for candidates, exact-Jaccard "
    "verification. At 100 TB only same-bucket pairs are compared — the "
    "candidate set is linear-ish in corpus size instead of O(n^2). "
    "Recall at J=0.5 is 1-(1-0.5^2)^8 = 0.90 by construction (candidates "
    "only; verification removes false positives, identically cross-engine).",
    tags=("dedup", "flagship"),
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return neardup_pairs(fan_out(load(spark, sf_dir, "documents")))


#: stop-shingle threshold for the declared drop variant: shingles in more
#: docs than this are boilerplate, not content.
STOP_SHINGLE_DF = 10


@register(
    "q_dedup_minhash_stopshingle",
    oracle=f"""
    WITH {_SHINGLES_SQL.strip()},
    raw_shingles AS (SELECT doc_id, shingle FROM shingles),
    kept AS (
        SELECT shingle FROM raw_shingles
        GROUP BY shingle HAVING COUNT(*) <= {STOP_SHINGLE_DF}
    ),
    fshingles AS (
        SELECT doc_id, shingle FROM raw_shingles
        WHERE shingle IN (SELECT shingle FROM kept)
    ),
    {_minhash_sql_over('fshingles').strip()},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM fshingles GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
        FROM candidates c
        JOIN fshingles a ON c.doc_a = a.doc_id
        JOIN fshingles b ON c.doc_b = b.doc_id AND a.shingle = b.shingle
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= {JACCARD_THRESHOLD}
    """,
    doc=f"MinHash+LSH with the STOP-SHINGLE DROP applied (df > "
    f"{STOP_SHINGLE_DF} shingles removed corpus-wide before hashing): the "
    "production guard against band-bucket skew — a boilerplate shingle "
    "shared by half the corpus puts O(n^2/4) pairs into one bucket, which "
    "no AQE setting survives at 100 TB. The hot set folds to one "
    "broadcast array; removal is an in-row array_except (zero extra "
    "corpus shuffles). Jaccard is then computed over the REDUCED sets on "
    "both engines — identical semantics cross-engine, verified by the "
    "oracle's HAVING-filtered shingle CTE.",
    tags=("dedup",),
)
def q_dedup_minhash_stopshingle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return neardup_pairs(
        fan_out(load(spark, sf_dir, "documents")), stop_shingle_df=STOP_SHINGLE_DF
    )


# ---------------------------------------------------------------------------
# 3b. incremental dedup: new batch vs frozen corpus
# ---------------------------------------------------------------------------

#: every BATCH_MOD-th doc plays the role of today's incoming batch; the
#: rest are the already-ingested corpus.
BATCH_MOD = 10


@register(
    "q_dedup_incremental",
    oracle=f"""
    WITH {_SHINGLES_SQL.strip()},
    batch AS (SELECT * FROM documents WHERE doc_id % {BATCH_MOD} = 0),
    corpus AS (SELECT * FROM documents WHERE doc_id % {BATCH_MOD} <> 0),
    corpus_fp AS (SELECT DISTINCT md5(text) AS fp FROM corpus),
    {_minhash_sql_over('shingles').strip()},
    cross_cand AS (
        SELECT DISTINCT c.doc_a, c.doc_b FROM candidates c
        WHERE (c.doc_a % {BATCH_MOD} = 0) <> (c.doc_b % {BATCH_MOD} = 0)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
        FROM cross_cand c
        JOIN shingles a ON c.doc_a = a.doc_id
        JOIN shingles b ON c.doc_b = b.doc_id AND a.shingle = b.shingle
        GROUP BY c.doc_a, c.doc_b
    ),
    near_hits AS (
        SELECT CASE WHEN i.doc_a % {BATCH_MOD} = 0 THEN i.doc_a ELSE i.doc_b END AS doc_id
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= {JACCARD_THRESHOLD}
    )
    SELECT b.doc_id,
           md5(b.text) IN (SELECT fp FROM corpus_fp) AS is_exact_dup,
           b.doc_id IN (SELECT doc_id FROM near_hits) AS is_near_dup,
           NOT (md5(b.text) IN (SELECT fp FROM corpus_fp)
                OR b.doc_id IN (SELECT doc_id FROM near_hits)) AS keep
    FROM batch b
    """,
    doc="INCREMENTAL dedup — the production 100 TB shape: a new batch is "
    "deduped AGAINST the frozen corpus without ever re-deduping the "
    "corpus itself. Exact layer: batch fingerprints semi-join the corpus "
    "fingerprint set (at scale, a stored dedup index; one shuffle keyed "
    "on fp). Near layer: the SAME banded LSH as q_dedup_minhash, but "
    "candidates are restricted to CROSS pairs (one batch side, one "
    "corpus side) — batch-internal and corpus-internal pairs are never "
    "verified, so per-ingest cost scales with the BATCH, not the corpus. "
    "At scale the corpus signatures/bands are precomputed and stored; "
    "here both sides derive from the fixture split (doc_id % "
    f"{BATCH_MOD}).",
    tags=("dedup",),
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load(spark, sf_dir, "documents"))
    is_batch = F.col("doc_id") % BATCH_MOD == 0
    batch = docs.filter(is_batch)
    corpus = docs.filter(~is_batch)

    corpus_fp = corpus.select(F.md5("text").alias("__fp")).distinct()
    exact_ids = (
        batch.select("doc_id", F.md5("text").alias("__fp"))
        .join(corpus_fp, "__fp", "left_semi")
        .select("doc_id")
    )

    shs = materialize(shingle_arrays(docs))
    sig = materialize(
        minhash_signatures(shs.select("doc_id", F.explode("shs").alias("shingle")))
    )
    cross = lsh_candidate_pairs(sig).filter(
        (F.col("doc_a") % BATCH_MOD == 0) != (F.col("doc_b") % BATCH_MOD == 0)
    )
    near_ids = (
        verify_jaccard(cross, shs)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select(
            F.when(F.col("doc_a") % BATCH_MOD == 0, F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("doc_id")
        )
        .distinct()
    )

    exact_flag = F.col("__e").isNotNull()
    near_flag = F.col("__n").isNotNull()
    return (
        batch.select("doc_id")
        .join(exact_ids.select(F.col("doc_id"), F.lit(1).alias("__e")), "doc_id", "left")
        .join(near_ids.select(F.col("doc_id"), F.lit(1).alias("__n")), "doc_id", "left")
        .select(
            "doc_id",
            exact_flag.alias("is_exact_dup"),
            near_flag.alias("is_near_dup"),
            (~(exact_flag | near_flag)).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# 3c. content-defined chunking (CDC) dedup
# ---------------------------------------------------------------------------

#: a token ends a chunk when its hash % CDC_MOD == 0 -> expected chunk
#: length = CDC_MOD tokens, boundaries INVARIANT under insertions elsewhere.
CDC_MOD = 16


@register(
    "q_dedup_cdc_chunks",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {_WORDS_SQL} AS ws FROM documents
    ),
    base AS (
        SELECT doc_id, ws, len(ws) AS n,
               list_transform(ws, t -> {sql_shared_hash32('t', 'cdc:')}) AS hs
        FROM w WHERE len(ws) >= 1
    ),
    bounded AS (
        SELECT doc_id, ws,
               list_concat(list_concat([0],
                   list_filter(range(1, n), i -> hs[i] % {CDC_MOD} = 0)), [n]) AS bounds
        FROM base
    ),
    chunks AS (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(bounds)),
                   j -> md5(array_to_string(ws[bounds[j]+1 : bounds[j+1]], ' ')))) AS chunk_fp
        FROM bounded
    )
    SELECT chunk_fp,
           COUNT(*) AS n_copies,
           COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS keep_doc_id
    FROM chunks
    GROUP BY chunk_fp
    """,
    doc="Content-defined chunking dedup (the FastCDC/gear-hash idea over "
    "tokens): a chunk boundary falls after any token whose hash is 0 mod "
    f"{CDC_MOD}, so boundaries depend only on LOCAL content — insert a "
    "paragraph and every other chunk's fingerprint survives, which is "
    "exactly what fixed-width chunking destroys. Chunks are derived "
    "ENTIRELY in-row (token hash array -> boundary filter -> md5 per "
    "span; one narrow map), then one corpus-wide shuffle on the chunk "
    "fingerprint aggregates copies — the sub-document dedup layer between "
    "exact (whole-doc) and MinHash (near-doc) in a training-data "
    "pipeline.",
    tags=("dedup",),
)
def q_dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = cdc_chunks(fan_out(load(spark, sf_dir, "documents")))
    return chunks.groupBy("chunk_fp").agg(
        F.count("*").alias("n_copies"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("doc_id").alias("keep_doc_id"),
    )


def cdc_chunks(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_fp) — one row per content-defined chunk occurrence.
    Boundary after token i iff hash(token_i) % CDC_MOD == 0; the whole
    derivation is in-row (no shuffle)."""
    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))
    base = docs.select("doc_id", ws.alias("ws")).filter(F.size("ws") >= 1)
    n = F.size("ws")
    hs = F.transform(F.col("ws"), lambda t: shared_hash32(t, "cdc:"))
    base = base.select("doc_id", "ws", n.alias("n"), hs.alias("hs"))
    # interior boundaries: 1..n-1 (sequence clamped to stay total; the
    # i <= n-1 guard drops the clamp artifact — see shingle_arrays)
    bidx = F.filter(
        F.sequence(F.lit(1), F.greatest(F.col("n") - 1, F.lit(1))),
        lambda i: (i <= F.col("n") - 1)
        & (F.element_at(F.col("hs"), i) % CDC_MOD == 0),
    )
    bounds = F.concat(F.array(F.lit(0)), bidx, F.array(F.col("n")))
    bounded = base.select("doc_id", "ws", bounds.alias("bounds"))
    span_fp = lambda j: F.md5(
        F.concat_ws(
            " ",
            F.slice(
                F.col("ws"),
                F.element_at(F.col("bounds"), j) + 1,
                F.element_at(F.col("bounds"), j + 1) - F.element_at(F.col("bounds"), j),
            ),
        )
    )
    fps = F.transform(
        F.sequence(F.lit(1), F.size("bounds") - 1), lambda j: span_fp(j)
    )
    return bounded.select("doc_id", F.explode(fps).alias("chunk_fp"))


# ---------------------------------------------------------------------------
# 4. SimHash near-dup
# ---------------------------------------------------------------------------


def _simhash_sql() -> str:
    bit_votes = ",\n           ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{i}"
        for i in range(SIMHASH_BITS)
    )
    assemble = " + ".join(
        f"(CASE WHEN v_{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)" for i in range(SIMHASH_BITS)
    )
    chunk_size = SIMHASH_BITS // SIMHASH_CHUNKS
    chunk_rows = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, simhash, {c} AS chunk, (simhash >> {c * chunk_size}) & {(1 << chunk_size) - 1} AS chunk_val FROM sim"
        for c in range(SIMHASH_CHUNKS)
    )
    return f"""
    tokens AS (
        SELECT DISTINCT doc_id, UNNEST({_WORDS_SQL}) AS token FROM documents
    ),
    votes AS (
        SELECT doc_id,
           {bit_votes}
        FROM (SELECT doc_id, {sql_shared_hash('token')} AS h FROM tokens) t
        GROUP BY doc_id
    ),
    sim AS (SELECT doc_id, {assemble} AS simhash FROM votes),
    chunks AS (
        {chunk_rows}
    )
    """


@register(
    "q_dedup_simhash",
    oracle=f"""
    WITH {_simhash_sql().strip()}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM chunks a JOIN chunks b
      ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    """,
    doc=f"SimHash near-dup: {SIMHASH_BITS}-bit fingerprint from per-token "
    "bit votes, then pigeonhole blocking — a pair within hamming distance "
    f"{HAMMING_MAX} must agree on at least one of {SIMHASH_CHUNKS} chunks, "
    "so the join runs on chunk equality (linear-ish candidates), hamming "
    "verified with bit_count(xor). The fingerprint is computed entirely "
    "IN-ROW: array_distinct dedups the token set per doc and the bit "
    "votes fold over the hashed array, so the whole signature stage is a "
    "narrow map — ZERO shuffles before the candidate join (the previous "
    "explode+distinct+groupBy shape shuffled the corpus-sized token "
    "stream twice).",
    tags=("dedup",),
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load(spark, sf_dir, "documents"))
    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))
    # hash the DISTINCT token set in-row (hash inline, map-side: a
    # dictionary join either needs an unbounded broadcast or an extra
    # occurrence-stream shuffle — both worse than re-hashing in codegen).
    # Separate projection so the 32 vote folds below read the bound `hs`
    # attribute instead of re-deriving 1 md5 per (token, bit).
    hashed = docs.select(
        "doc_id",
        F.transform(F.array_distinct(ws), lambda t: shared_hash(t)).alias("hs"),
    )
    # per-bit vote = fold of +-1 over the hash array (order-independent
    # integer sum); bit set iff vote > 0 — same semantics as the oracle's
    # SUM(CASE...) GROUP BY doc_id, but with no aggregation at all. Built
    # as ONE SQL string (round 13, VERDICT item 7): the 32-bit Column
    # builder loop cost ~320 py4j round trips (~1s of per-run fn-build
    # time); the string parses the identical fold/CASE expressions
    # (rows verified equal).
    simhash = " + ".join(
        f"(CASE WHEN aggregate(hs, 0, (acc, h) -> acc + "
        f"(CASE WHEN (shiftright(h, {i}) & 1) = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN cast({1 << i} as bigint) ELSE cast(0 as bigint) END)"
        for i in range(SIMHASH_BITS)
    )
    # one row per doc; feeds both sides of the chunk self-join — without
    # this the in-row hash+fold stage executes twice
    sim = materialize(hashed.selectExpr("doc_id", f"{simhash} as simhash"))

    chunk_size = SIMHASH_BITS // SIMHASH_CHUNKS
    # one posexplode pass over all chunks (see lsh_candidate_pairs)
    chunk_vals = F.array(
        *[
            F.shiftright(F.col("simhash"), c * chunk_size).bitwiseAND((1 << chunk_size) - 1)
            for c in range(SIMHASH_CHUNKS)
        ]
    )
    chunks = sim.select("doc_id", "simhash", F.posexplode(chunk_vals).alias("chunk", "chunk_val"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(hamming <= HAMMING_MAX)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"), hamming.alias("hamming"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# 5. embedding-cosine near-dup
# ---------------------------------------------------------------------------

EMBED_DIM = 64
COSINE_DUP_THRESHOLD = 0.8
#: In-query planted near-dups: the fixture has no pair above the threshold,
#: so the declared query unions a scaled clone (vec_id + offset, embedding
#: doubled) of the first N_PLANTED vectors — scaling by 2 is exact in any
#: float width, so cosine(source, clone) computes to ~1.0 identically in
#: both engines and the pass is non-vacuous (round-1 row was 0 == 0).
N_PLANTED = 5
PLANT_OFFSET = 1_000_000


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {EMBED_DIM + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def spark_dot(a, b):
    """Sequential double dot product — identical fold order to ``_sql_dot``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# --- sign-random-projection (hyperplane) LSH over embeddings --------------

#: number of hyperplanes = bits in the LSH code, banded into RP_CHUNKS
#: chunks (8 bits each). Chunk width sets the candidate volume: random
#: vectors spread over 2^8 = 256 buckets per chunk, so candidates are
#: ~ n^2 * chunks / (2 * 256) — the width must grow with log2(n) to stay
#: linear-ish (documented scale knob). Recall: a pair with cosine c agrees
#: on one fixed bit with prob p = 1 - acos(c)/pi, on a chunk with p^8, on
#: >= 1 of 4 chunks with 1-(1-p^8)^4 — ~1.0 for true duplicates (c -> 1,
#: e.g. scaled copies collide with certainty), ~0.5 at c = 0.9. Production
#: tunes bands/width/multi-probe per target threshold; the verification
#: stage is exact either way.
RP_PLANES = 32
RP_CHUNKS = 4


def _plane_signs() -> list[list[int]]:
    """Deterministic +-1 hyperplane components from the shared md5 hash
    family — reproducible in SQL-free Python here AND recomputed nowhere:
    both engines consume the same literal sign table, so the oracle is
    bit-identical by construction. (Same construction as hashing.py's
    shared_hash: int(md5[:15], 16).)"""
    import hashlib

    def h(p: int, i: int) -> int:
        return int(hashlib.md5(f"rp{p}:{i}".encode()).hexdigest()[:15], 16)

    return [[1 if h(p, i) % 2 == 1 else -1 for i in range(EMBED_DIM)] for p in range(RP_PLANES)]


_SIGNS = _plane_signs()


def _sql_rp_dot(vec: str, plane: list[int]) -> str:
    lits = ", ".join(f"{s:.1f}" for s in plane)
    return (
        f"list_sum(list_transform(range(1, {EMBED_DIM + 1}), "
        f"i -> CAST({vec}[i] AS DOUBLE) * ([{lits}])[i]))"
    )


def rp_lsh_code(e: DataFrame, vec: str = "embedding") -> DataFrame:
    """Append the RP_PLANES-bit sign-LSH code as ``code`` (long). The code
    is a pure narrow map — at 100 TB this is one pass, no shuffle.

    Built as ONE SQL string (round 13, VERDICT item 7): the Column form
    constructed 32 planes x 64 sign literals through py4j (~2k round
    trips, ~1s of fn-build time per run); the string form parses the
    identical expressions — same D-suffixed double literals, same
    left-to-right fold per plane, same ascending-plane bit sum (rows
    verified equal against the Column form)."""
    terms = []
    for p, plane in enumerate(_SIGNS):
        lits = ", ".join(f"{s:.1f}D" for s in plane)
        dot = (
            f"aggregate(zip_with({vec}, array({lits}), (x, s) -> cast(x as double) * s), "
            "cast(0.0 as double), (acc, x) -> acc + x)"
        )
        terms.append(
            f"(CASE WHEN {dot} >= 0 THEN cast({1 << p} as bigint) "
            "ELSE cast(0 as bigint) END)"
        )
    return e.selectExpr("*", " + ".join(terms) + " as code")


@register(
    "q_dedup_embedding_lsh",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, label, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + {PLANT_OFFSET}, label,
               list_transform(embedding, x -> CAST(x * 2.0 AS FLOAT))
        FROM embeddings WHERE vec_id < {N_PLANTED}
    ), coded AS (
        SELECT vec_id, embedding,
               {' + '.join(
                   f"(CASE WHEN {_sql_rp_dot('embedding', _SIGNS[p])} >= 0 "
                   f"THEN CAST({1 << p} AS BIGINT) ELSE 0 END)"
                   for p in range(RP_PLANES)
               )} AS code
        FROM corpus
    ), chunks AS (
        {" UNION ALL ".join(
            f"SELECT vec_id, embedding, {c} AS chunk, "
            f"(code >> {c * (RP_PLANES // RP_CHUNKS)}) & {(1 << (RP_PLANES // RP_CHUNKS)) - 1} AS chunk_val "
            "FROM coded"
            for c in range(RP_CHUNKS)
        )}
    ), cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
               a.embedding AS ea, b.embedding AS eb
        FROM chunks a JOIN chunks b
          ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b,
           {_sql_dot('ea', 'eb')}
             / (SQRT({_sql_dot('ea', 'ea')}) * SQRT({_sql_dot('eb', 'eb')})) AS cosine
    FROM cand
    WHERE {_sql_dot('ea', 'eb')}
             / (SQRT({_sql_dot('ea', 'ea')}) * SQRT({_sql_dot('eb', 'eb')})) >= {COSINE_DUP_THRESHOLD}
    """,
    doc=f"Embedding near-dup via sign-random-projection LSH — the 100 TB "
    "path that q_dedup_embedding's label-blocking stands in for: "
    f"{RP_PLANES} deterministic +-1 hyperplanes (shared md5 family -> same "
    f"literal sign table in both engines) give each vector a {RP_PLANES}-bit "
    f"code; {RP_CHUNKS}-chunk pigeonhole banding yields candidates (pairs "
    "close in cosine agree on a chunk with high probability), exact cosine "
    "verifies. No all-pairs join anywhere; the code is a narrow map and "
    "candidates are bucket-joined. Planted scaled clones make the result "
    "non-vacuous (a doubled vector projects to the identical code).",
    tags=("dedup", "similarity", "flagship"),
)
def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = fan_out(load(spark, sf_dir, "embeddings")).select("vec_id", "label", "embedding")
    clones = base.filter(F.col("vec_id") < N_PLANTED).select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
        "label",
        F.transform("embedding", lambda x: (x * F.lit(2.0)).cast("float")).alias("embedding"),
    )
    # 32x64 dot products per row is the dominant cost; coded feeds both
    # sides of the chunk self-join — materialize so coding runs once
    coded = materialize(rp_lsh_code(base.unionByName(clones)))

    chunk_bits = RP_PLANES // RP_CHUNKS
    chunk_vals = F.array(
        *[
            F.shiftright(F.col("code"), c * chunk_bits).bitwiseAND((1 << chunk_bits) - 1)
            for c in range(RP_CHUNKS)
        ]
    )
    chunks = coded.select(
        "vec_id", "embedding", F.posexplode(chunk_vals).alias("chunk", "chunk_val")
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.embedding").alias("ea"),
            F.col("b.embedding").alias("eb"),
        )
    )
    # cosine BEFORE the dedup of multi-chunk candidates: it is deterministic
    # per pair, and distinct over 3 scalars shuffles ~40x fewer bytes than
    # distinct over two 64-float arrays (a pair collides in <= RP_CHUNKS
    # chunks, so the <= 4x recompute of a 64-mult dot is the cheap side)
    cosine = spark_dot(F.col("ea"), F.col("eb")) / (
        F.sqrt(spark_dot(F.col("ea"), F.col("ea"))) * F.sqrt(spark_dot(F.col("eb"), F.col("eb")))
    )
    return (
        cand.select("id_a", "id_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
        .distinct()
    )


@register(
    "q_dedup_embedding",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, label, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + {PLANT_OFFSET}, label,
               list_transform(embedding, x -> CAST(x * 2.0 AS FLOAT))
        FROM embeddings WHERE vec_id < {N_PLANTED}
    ), pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {_sql_dot('a.embedding', 'b.embedding')} AS dot,
               SQRT({_sql_dot('a.embedding', 'a.embedding')}) AS na,
               SQRT({_sql_dot('b.embedding', 'b.embedding')}) AS nb
        FROM corpus a JOIN corpus b
          ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, dot / (na * nb) AS cosine
    FROM pairs
    WHERE dot / (na * nb) >= {COSINE_DUP_THRESHOLD}
    """,
    doc="Embedding-cosine near-dup, blocked on label (the pre-clustering "
    "a production pipeline gets from IVF/LSH bucketing) so candidate pairs "
    "are within-block instead of O(n^2). Dot products fold left-to-right "
    "in double in both engines -> bit-identical cosines. The corpus unions "
    f"{N_PLANTED} planted scaled clones in-query so the pass asserts real "
    "above-threshold pairs (round 1 passed vacuously at 0 rows).",
    tags=("dedup", "similarity"),
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    clones = base.filter(F.col("vec_id") < N_PLANTED).select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
        "label",
        F.transform("embedding", lambda x: (x * F.lit(2.0)).cast("float")).alias("embedding"),
    )
    # norms are computed ONCE per vector before the self-join (the oracle
    # recomputes them per pair — identical doubles, 2x fewer dot products).
    # fan_out first: the checkpoint otherwise inherits the single input
    # split, so the label-blocked pair stage (a 64-float interpreted dot
    # per pair) runs near-serial (io.fan_out; guide §2.2)
    e = materialize(
        fan_out(base.unionByName(clones)).withColumn(
            "norm", F.sqrt(spark_dot(F.col("embedding"), F.col("embedding")))
        )
    )
    a = e.alias("a")
    b = e.alias("b")
    dot = spark_dot(F.col("a.embedding"), F.col("b.embedding"))
    cosine = dot / (F.col("a.norm") * F.col("b.norm"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# 8. fuzzy (edit-distance) near-dup within blocking buckets
# ---------------------------------------------------------------------------

#: compare only the first FUZZY_PREFIX chars — edit distance is O(n*m) per
#: pair, so the comparison window must be bounded regardless of doc length.
FUZZY_PREFIX = 200
#: pairs with prefix edit distance <= this are near-duplicates.
FUZZY_THRESHOLD = 20
#: length-bucket width for blocking (docs whose n_chars differ by more than
#: one bucket are never compared).
FUZZY_BUCKET = 50
#: every (doc_id % FUZZY_CLONE_MOD == 0) doc gets a planted 1-edit clone so
#: the operator is provably non-vacuous at every SF.
FUZZY_CLONE_MOD = 97

_FUZZY_CORPUS_SQL = f"""
    corpus AS (
        SELECT doc_id, text, source, n_chars FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               substr(text, 1, 50) || 'X' || substr(text, 52) AS text,
               source, n_chars
        FROM documents WHERE doc_id % {FUZZY_CLONE_MOD} = 0
    )
"""


@register(
    "q_dedup_fuzzy",
    oracle=f"""
    WITH {_FUZZY_CORPUS_SQL.strip()}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(substr(a.text, 1, {FUZZY_PREFIX}),
                            substr(b.text, 1, {FUZZY_PREFIX})) AS INTEGER) AS dist
    FROM corpus a JOIN corpus b
      ON a.source = b.source
     AND CAST(FLOOR(a.n_chars / {FUZZY_BUCKET}.0) AS BIGINT)
         = CAST(FLOOR(b.n_chars / {FUZZY_BUCKET}.0) AS BIGINT)
     AND a.doc_id < b.doc_id
    WHERE levenshtein(substr(a.text, 1, {FUZZY_PREFIX}),
                      substr(b.text, 1, {FUZZY_PREFIX})) <= {FUZZY_THRESHOLD}
    """,
    doc=f"Fuzzy near-dup pairs by edit distance: Levenshtein over the "
    f"first {FUZZY_PREFIX} chars, compared only WITHIN blocking buckets "
    f"(same source, same n_chars/{FUZZY_BUCKET} length bucket) — the "
    "blocked-pairwise shape of record linkage. Both engines implement "
    "the classic unit-cost DP, so the integer distance is exactly "
    "comparable. A deterministic 1-substitution clone of every "
    f"{FUZZY_CLONE_MOD}th doc is unioned in so the operator returns "
    "pairs at every SF. Exact-duplicate PRE-COLLAPSE (round 9): docs "
    "sharing an identical comparison prefix within a block are grouped "
    "first, the O(len^2) DP runs once per DISTINCT-prefix pair, and id "
    "pairs are expanded afterward — identical-prefix pairs are dist=0 by "
    "definition, so the output is unchanged while DP cost tracks "
    "distinct texts, not raw rows. Real crawls carry 30-60% byte-exact "
    "duplicates (mirrors/reposts), which is where the collapse pays; "
    "the derived sf1 fixture deliberately SALTS its replicas "
    "(scale_fixtures.py), so there the 10x block population genuinely "
    "costs ~100x DP pairs on both engines — Spark spreads that across "
    "cores, the brute-force oracle pays it serially per pair. "
    "At 100 TB the block key is the shuffle key "
    "and the quadratic blow-up is bounded per-bucket (bucket population "
    "is what you tune, exactly like LSH band width); the DP cost per "
    "pair is capped by the prefix window. Skew note: a viral exact-dup "
    "group emits C(n,2) pairs — that blow-up is output-inherent (the "
    "pair list itself is quadratic); production corpora should route "
    "exact dups through q_dedup_exact survivorship first.",
    tags=("dedup",),
)
def q_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(
        load(spark, sf_dir, "documents").select("doc_id", "text", "source", "n_chars")
    )
    clones = (
        docs.filter(F.col("doc_id") % FUZZY_CLONE_MOD == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(
                F.expr("substring(text, 1, 50)"),
                F.lit("X"),
                F.expr("substring(text, 52, 2147483647)"),
            ).alias("text"),
            "source",
            "n_chars",
        )
    )
    corpus = docs.unionByName(clones).select(
        "doc_id",
        F.expr(f"substring(text, 1, {FUZZY_PREFIX})").alias("prefix"),
        "source",
        F.floor(F.col("n_chars") / FUZZY_BUCKET).cast("bigint").alias("bucket"),
    )
    # Exact-duplicate pre-collapse: one group per distinct prefix within a
    # block. NULL prefixes are dropped up front — in the pairwise form
    # levenshtein(NULL, x) is NULL, which never passes the threshold
    # filter, so a NULL-prefix doc can appear in no output pair.
    # materialize: groups feeds THREE consumers (within + both join sides)
    # — without it the scan + groupBy executes three times. One row per
    # distinct prefix — the doc-sized shape materialize's contract wants.
    groups = materialize(
        corpus.filter(F.col("prefix").isNotNull())
        .groupBy("source", "bucket", "prefix")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
    )
    # Within-group pairs: identical prefixes, dist = 0. Sorted ids make
    # the (doc_a < doc_b) orientation deterministic; the pair expansion
    # is a JVM-side higher-order function, no Python in the loop.
    within = (
        groups.filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b", F.lit(0).cast("int").alias("dist"))
    )
    # Cross-group pairs: DP once per distinct-prefix pair (prefix_a <
    # prefix_b picks each unordered group pair exactly once), then expand
    # the id cross product; least/greatest restores doc_id orientation
    # (distance is symmetric, so orientation never changes the value).
    # The DP probe side needs an EXPLICIT numbered repartition: the join's
    # build side auto-broadcasts when small, and AQE coalesces the tiny-
    # BYTES groupBy shuffle to one partition (it sizes by bytes, blind to
    # the 40k-cell DP each surviving row pays downstream) — measured 19.5s
    # single-task vs ~1s spread at sf0.1. A user-specified partition count
    # is exempt from AQE coalescing; at cluster scale both sides outgrow
    # the broadcast threshold and the join reverts to a (source, bucket)
    # shuffle join whose partitions carry real byte weight, so the extra
    # round-robin pass stays noise next to the DP stage it feeds.
    n = spark.sparkContext.defaultParallelism
    ga = groups.repartition(n).select(
        "source", "bucket", F.col("prefix").alias("prefix_a"), F.col("ids").alias("ids_a")
    )
    gb = groups.select(
        "source", "bucket", F.col("prefix").alias("prefix_b"), F.col("ids").alias("ids_b")
    )
    dist = F.levenshtein(F.col("prefix_a"), F.col("prefix_b"))
    cross = (
        ga.join(gb, ["source", "bucket"])
        .filter(F.col("prefix_a") < F.col("prefix_b"))
        .filter(dist <= FUZZY_THRESHOLD)
        .select(dist.cast("int").alias("dist"), "ids_a", "ids_b")
        .select("dist", F.explode("ids_a").alias("ia"), "ids_b")
        .select("dist", "ia", F.explode("ids_b").alias("ib"))
        .select(
            F.least("ia", "ib").alias("doc_a"),
            F.greatest("ia", "ib").alias("doc_b"),
            "dist",
        )
    )
    return within.unionByName(cross)


# ---------------------------------------------------------------------------
# prefix-filtered all-pairs similarity join (AllPairs/PPJoin family)
# ---------------------------------------------------------------------------


def prefix_candidates(
    sh: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    *,
    shs_arrays: DataFrame | None = None,
) -> DataFrame:
    """Distinct (doc_a < doc_b) candidate pairs from the prefix filter:
    order each doc's shingles by global df (rarest first, ties by value),
    keep the first |d| - ceil(t*|d|) + 1, equi-join prefixes. Complete for
    Jaccard >= ``threshold`` by the prefix-filter theorem.

    ``shs_arrays`` (optional): the per-doc DISTINCT-shingle ARRAY table the
    exploded ``sh`` derives from. When provided, per-doc set sizes come
    from an in-row ``F.size`` over it instead of a corpus-stream groupBy —
    identical values (one exploded row per distinct shingle), one full
    occurrence-stream shuffle removed (guide §2.4)."""
    from pyspark.sql import Window as W

    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    sizes = (
        shs_arrays.select("doc_id", F.size("shs").alias("sz"))
        if shs_arrays is not None
        else sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    )
    prefix_len = (
        F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")).cast("long") + 1
    )
    # the prefix stream feeds BOTH sides of the candidate self-join; without
    # the checkpoint the df-join + per-doc rank window executes twice
    # (measured 11.7s vs ~3s at sf0.1). The checkpoint is prefix-sized —
    # strictly smaller than the shingle stream.
    prefixes = materialize(
        sh.join(dfreq, "shingle")
        .withColumn(
            "pos",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("shingle").asc())
            ),
        )
        .join(sizes, "doc_id")
        .filter(F.col("pos") <= prefix_len)
        .select("doc_id", "shingle", "pos", "sz")
    )
    # PPJoin pruning on each raw prefix match, BEFORE the distinct:
    # - length filter: J >= t forces t*|a| <= |b| <= |a|/t;
    # - positional filter: the overlap still reachable from match
    #   positions (pa, pb) is 1 + min(|a|-pa, |b|-pb); if that cannot
    #   reach the required overlap ceil(t/(1+t)*(|a|+|b|)) the pair
    #   cannot qualify. The 1e-9 slack keeps the ceil CONSERVATIVE under
    #   float rounding — completeness is never traded (and is
    #   property-tested against a pure-Python reference). At sf0.1 these
    #   two predicates cut raw candidates ~10x before the distinct.
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("a.sz") + F.col("b.sz"))
        - F.lit(1e-9)
    )
    reachable = F.lit(1) + F.least(
        F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos")
    )
    # carry both docs' (functional) sizes through the distinct: sz is
    # determined by doc_id, so the candidate-pair cardinality is unchanged,
    # and the verification stage can compute Jaccard without re-joining the
    # doc-size table twice (guide §2.4 — round-12: dropped one checkpoint
    # job + two joins from prefix_filter_pairs)
    return (
        prefixes.alias("a")
        .join(
            prefixes.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(
            (F.col("b.sz") >= F.lit(threshold) * F.col("a.sz"))
            & (F.col("a.sz") >= F.lit(threshold) * F.col("b.sz"))
            & (reachable >= alpha)
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .distinct()
    )


def prefix_filter_pairs(
    sh: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    *,
    shs_arrays: DataFrame | None = None,
) -> DataFrame:
    """Prefix-filter candidates + exact Jaccard verification — the full
    AllPairs/PPJoin pipeline over an exploded (doc_id, shingle) set.

    Candidates carry both docs' shingle-set sizes out of the candidate join
    (sz is functional on doc_id — prefix_candidates already computes it for
    the PPJoin length filter), so verification needs only the intersection
    count: no separate size table, no checkpoint job for it, and two fewer
    joins than the round-11 shape (guide §2.4).

    ``shs_arrays`` (optional, round 13): the per-doc shingle ARRAY table.
    When provided, verification is the verify_jaccard shape — join the
    |docs|-row array table per side and count ``|A ∩ B|`` IN-ROW via
    ``array_intersect`` — instead of re-joining the corpus-sized exploded
    occurrence stream twice and re-aggregating (guide §2.3: the shuffled
    bytes scale with candidates x arrays, not with the occurrence stream;
    same restructure the minhash verify got in round 4). Identical
    Jaccard: both sides are distinct-shingle sets either way."""
    cands = prefix_candidates(sh, threshold, shs_arrays=shs_arrays)
    if shs_arrays is not None:
        a = shs_arrays.select(F.col("doc_id").alias("__ja"), F.col("shs").alias("shs_a"))
        b = shs_arrays.select(F.col("doc_id").alias("__jb"), F.col("shs").alias("shs_b"))
        inter = F.size(F.array_intersect("shs_a", "shs_b"))
        return (
            cands.join(a, F.col("doc_a") == F.col("__ja"))
            .join(b, F.col("doc_b") == F.col("__jb"))
            .select(
                "doc_a",
                "doc_b",
                (
                    inter.cast("double")
                    / (F.col("sz_a") + F.col("sz_b") - inter)
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
    inter = (
        cands.join(sh.alias("x"), F.col("doc_a") == F.col("x.doc_id"))
        .join(
            sh.alias("y"),
            (F.col("doc_b") == F.col("y.doc_id"))
            & (F.col("x.shingle") == F.col("y.shingle")),
        )
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


#: the declared prefix-filter query runs at the HIGH threshold the
#: AllPairs/PPJoin literature targets: prefix length is |d|-ceil(t|d|)+1,
#: so at t=0.5 prefixes cover half of every document and candidate volume
#: balloons (measured 409k raw candidates at sf0.1); at t=0.8 prefixes
#: are ~20% of each doc and the filters bite. The generic helpers accept
#: any threshold — the property suite adjudicates completeness at the
#: harder t=0.5.
PREFIX_FILTER_THRESHOLD = 0.8


@register(
    "q_dedup_prefix_filter",
    oracle=f"""
    WITH {_SHINGLES_SQL.strip()},
    {_JACCARD_PAIRS_SQL.strip()}
    SELECT doc_a, doc_b, jaccard
    FROM jaccard_pairs
    WHERE jaccard >= {PREFIX_FILTER_THRESHOLD}
    """,
    doc=f"Prefix-filtered set-similarity self-join (Bayardo et al. "
    "AllPairs / Xiao et al. PPJoin — the DETERMINISTIC scale path next "
    "to probabilistic MinHash-LSH): order each doc's shingles by global "
    "document frequency (rarest first, ties by value), keep only the "
    f"first |d| - ceil({PREFIX_FILTER_THRESHOLD}*|d|) + 1 as the PREFIX, "
    "generate candidates by equi-joining prefixes, and prune each raw "
    "match with the PPJoin length and positional filters before the "
    "distinct — the prefix-filter theorem guarantees every pair with "
    "Jaccard >= t shares a prefix token, so unlike LSH there are NO "
    "false negatives: the oracle is the naive exact all-pairs join and "
    "must match EXACTLY, which adjudicates the completeness property "
    "itself (and the property suite re-proves it on random corpora at "
    "the harder t=0.5). Exact Jaccard verification runs on candidates "
    "only. At 100 TB the frequency ordering concentrates the join on "
    "the rarest tokens (the df table is one narrow aggregate, shuffled "
    "once), candidate volume tracks true-pair volume instead of n^2, "
    "and skew is structurally bounded because high-df boilerplate "
    "tokens are exactly the ones prefix selection discards. "
    "CANDIDATE-GROWTH BOUND: raw candidates = sum over shingles w of "
    "C(df_p(w), 2), where df_p(w) is w's document frequency WITHIN "
    f"prefixes — at t={PREFIX_FILTER_THRESHOLD} prefixes keep only the "
    "rarest ~(1-t) fraction of each doc, so df_p is minimized by "
    "construction and the sum is <= max_w df_p(w) x (total prefix "
    "postings), i.e. LINEAR in corpus size times the heaviest surviving "
    "prefix token's df (cost distribution and per-decade steps in "
    "BENCH_NOTES.md / SCALING.md). The bound degrades as t drops "
    "(prefix length |d|(1-t)+1 grows and df_p with it — measured 409k "
    "raw candidates at t=0.5 on sf0.1 vs the t=0.8 declared query's "
    "filter-bitten set): below t~0.7, or on corpora whose rare-token "
    "tail is still high-df, switch to the probabilistic twin "
    "q_dedup_minhash (banded MinHash-LSH, same candidates-then-verify "
    f"shape, constant {NUM_BANDS}-bucket cost per doc independent of t) "
    "and accept its measured false-negative rate "
    "(q_dedup_minhash_accuracy) in exchange for the bounded candidate "
    "volume.",
    tags=("dedup",),
)
def q_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # checkpoint the |docs|-row ARRAY table, not the corpus-sized exploded
    # stream (round 13 — the module's own doc-granular-checkpoint
    # discipline; the exploded stream is derived lazily and only feeds the
    # df/prefix aggregations), and verify in-row via the array table
    # (prefix_filter_pairs shs_arrays path)
    shs = materialize(shingle_arrays(fan_out(load(spark, sf_dir, "documents"))))
    sh = shs.select("doc_id", F.explode("shs").alias("shingle"))
    return prefix_filter_pairs(sh, PREFIX_FILTER_THRESHOLD, shs_arrays=shs)


# ---------------------------------------------------------------------------
# 12. sorted-neighborhood method + containment (excerpt) detection
# ---------------------------------------------------------------------------

#: SNM sliding-window width (each doc is paired with the next W docs in
#: blocking-key order) and the block prefix that bounds the window shuffle.
SNM_WINDOW = 3
SNM_KEY_LEN = 40
SNM_BLOCK_LEN = 8

_SNM_KEY_SQL = (
    f"substring(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), 1, {SNM_KEY_LEN})"
)


@register(
    "q_dedup_snm",
    oracle=f"""
    WITH {_SHINGLES_SQL.strip()},
    keyed AS (
        SELECT doc_id, {_SNM_KEY_SQL} AS k FROM documents
    ), nb AS (
        SELECT doc_id,
               LEAD(doc_id, 1) OVER w AS n1,
               LEAD(doc_id, 2) OVER w AS n2,
               LEAD(doc_id, 3) OVER w AS n3
        FROM keyed
        WINDOW w AS (PARTITION BY substring(k, 1, {SNM_BLOCK_LEN})
                     ORDER BY k, doc_id)
    ), cand AS (
        SELECT LEAST(doc_id, n) AS doc_a, GREATEST(doc_id, n) AS doc_b
        FROM (SELECT doc_id, UNNEST([n1, n2, n3]) AS n FROM nb)
        WHERE n IS NOT NULL
    ), sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    verified AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
        FROM cand c
        JOIN shingles a ON a.doc_id = c.doc_a
        JOIN shingles b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT v.doc_a, v.doc_b,
           CAST(v.inter AS DOUBLE) / (sa.n + sb.n - v.inter) AS jaccard
    FROM verified v
    JOIN sizes sa ON v.doc_a = sa.doc_id
    JOIN sizes sb ON v.doc_b = sb.doc_id
    WHERE CAST(v.inter AS DOUBLE) / (sa.n + sb.n - v.inter)
            >= {JACCARD_THRESHOLD}
    """,
    doc="Sorted-neighborhood dedup (Hernandez & Stolfo's SNM, the classic "
    "entity-resolution blocking alternative to LSH): docs sort by a "
    f"normalized {SNM_KEY_LEN}-char blocking key, each doc is paired with "
    f"its next {SNM_WINDOW} neighbors in key order, and only those "
    "candidates get exact Jaccard verification. The textbook method "
    "needs one GLOBAL sort; the distributed variant here partitions the "
    f"window by the key's {SNM_BLOCK_LEN}-char prefix, so the sort is a "
    "block-keyed shuffle that parallelizes — cross-block neighbor pairs "
    "are the documented trade (the standard remedy is multi-pass SNM "
    "with independent keys, same plan shape per pass). Candidate count "
    "is <= W x |docs| BY CONSTRUCTION — linear in the corpus, no "
    "quadratic blow-up and no banding false-negative probability: a "
    "deterministic complement to q_dedup_minhash. Verification reuses "
    "the candidates-only in-row array_intersect path.",
    tags=("dedup",),
)
def q_dedup_snm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = fan_out(load(spark, sf_dir, "documents"))
    key = F.substring(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), 1, SNM_KEY_LEN
    )
    keyed = docs.select("doc_id", key.alias("k"))
    w = W.partitionBy(F.substring(F.col("k"), 1, SNM_BLOCK_LEN)).orderBy("k", "doc_id")
    nb = keyed.select(
        "doc_id",
        F.array(*[F.lead("doc_id", i).over(w) for i in range(1, SNM_WINDOW + 1)]).alias(
            "nbrs"
        ),
    )
    cand = (
        nb.select("doc_id", F.explode("nbrs").alias("n"))
        .filter(F.col("n").isNotNull())
        .select(
            F.least("doc_id", "n").alias("doc_a"),
            F.greatest("doc_id", "n").alias("doc_b"),
        )
    )
    shs = materialize(shingle_arrays(docs))
    return verify_jaccard(cand, shs).filter(F.col("jaccard") >= JACCARD_THRESHOLD)


#: Overlap-coefficient threshold for excerpt/containment detection.
OVERLAP_THRESHOLD = 0.8


@register(
    "q_dedup_containment",
    oracle=f"""
    WITH {_SHINGLES_SQL.strip()},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM shingles a
        JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT p.doc_a, p.doc_b, sa.n AS n_a, sb.n AS n_b,
           CAST(p.inter AS DOUBLE) / LEAST(sa.n, sb.n) AS overlap
    FROM pairs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    WHERE CAST(p.inter AS DOUBLE) / LEAST(sa.n, sb.n) >= {OVERLAP_THRESHOLD}
    """,
    doc="Containment / overlap-coefficient near-dup detection "
    "(Szymkiewicz-Simpson: |A n B| / min(|A|,|B|)): catches EXCERPT "
    "duplicates — a short doc quoted inside a long one — which Jaccard "
    "structurally misses (a 100-shingle doc fully contained in a "
    "2000-shingle doc has Jaccard 0.05 but containment 1.0). This is "
    "the deduplication measure for quote/boilerplate removal in "
    "training corpora. Exact all-candidate baseline via the shared-"
    "shingle join, same contract as q_dedup_ngram_jaccard — the twin "
    "that adjudicates blocked scale paths; at 100 TB the same "
    "prefix-filter or LSH blocking applies (order docs by size and "
    "index the smaller side's prefix).",
    tags=("dedup",),
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # checkpoint the DOC-granular array table (policy: never the exploded
    # occurrence stream); sizes come from size() in-row and the exploded
    # join sides are narrow re-derivations of the same checkpoint
    shs = materialize(shingle_arrays(fan_out(load(spark, sf_dir, "documents"))))
    sh = shs.select("doc_id", F.explode("shs").alias("shingle"))
    sizes = shs.select("doc_id", F.size("shs").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    overlap = F.col("inter").cast("double") / F.least(F.col("sa.n"), F.col("sb.n"))
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.col("sa.n").alias("n_a"),
            F.col("sb.n").alias("n_b"),
            overlap.alias("overlap"),
        )
        .filter(F.col("overlap") >= OVERLAP_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# 14. blocking-quality evaluation (the LSH audit harness)
# ---------------------------------------------------------------------------


@register(
    "q_dedup_blocking_quality",
    oracle=f"""
    WITH {_SHINGLES_SQL.strip()},
    {_minhash_sql().strip()},
    {_JACCARD_PAIRS_SQL.strip()},
    truth AS (
        SELECT doc_a, doc_b FROM jaccard_pairs WHERE jaccard >= {JACCARD_THRESHOLD}
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM shingles),
    counts AS (
        SELECT (SELECT COUNT(*) FROM truth)      AS n_true,
               (SELECT COUNT(*) FROM candidates) AS n_cand,
               (SELECT COUNT(*) FROM candidates c
                JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b) AS n_hit,
               (SELECT n_docs FROM n)            AS n_docs
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           n_docs * (n_docs - 1) // 2 AS total_pairs,
           CAST(n_true AS BIGINT) AS n_true,
           CAST(n_cand AS BIGINT) AS n_cand,
           CAST(n_hit AS BIGINT)  AS n_hit,
           CAST(n_hit AS DOUBLE) / NULLIF(n_true, 0) AS pair_completeness,
           CAST(n_hit AS DOUBLE) / NULLIF(n_cand, 0) AS precision_at_block,
           1.0 - CAST(n_cand AS DOUBLE)
                   / NULLIF(CAST(n_docs * (n_docs - 1) // 2 AS DOUBLE), 0)
               AS reduction_ratio
    FROM counts
    """,
    doc="Blocking-quality evaluation of the MinHash/LSH candidate generator "
    "against the exact all-pairs Jaccard ground truth — the record-linkage "
    "audit triple: pair completeness (recall of true near-dup pairs "
    "surviving banding), precision at the blocking stage, and reduction "
    "ratio (fraction of the O(n^2) pair space the blocker never touches). "
    "This turns the LSH recall claim of q_dedup_minhash's docstring "
    "(1-(1-J^r)^b) into a MEASURED, oracled number. All counts are exact "
    "integers; the three ratios are final single divisions. At 100 TB the "
    "exact ground truth is infeasible by definition — this query is the "
    "AUDIT-SAMPLE harness: run it on a stratified sample (q_sample_hash's "
    "deterministic split) to estimate production blocking quality; the "
    "candidate/sig pipeline reuses the exact same shared stages as the "
    "production path, so the measured numbers transfer.",
    tags=("dedup", "llm", "eval"),
)
def q_dedup_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one checkpointed shingle-array table feeds signatures, truth pairs,
    # and sizes — the same materialization contract as neardup_pairs
    shs = materialize(shingle_arrays(fan_out(load(spark, sf_dir, "documents"))))
    exploded = shs.select("doc_id", F.explode("shs").alias("shingle"))
    sig = materialize(minhash_signatures(exploded))
    cand = lsh_candidate_pairs(sig)
    truth = jaccard_pairs(exploded, shs_arrays=shs).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    n_docs_row = shs.agg(F.count("*").alias("n_docs"))
    hit = cand.join(truth.select("doc_a", "doc_b"), ["doc_a", "doc_b"])
    counts = (
        cand.agg(F.count("*").alias("n_cand"))
        .join(F.broadcast(truth.agg(F.count("*").alias("n_true"))))
        .join(F.broadcast(hit.agg(F.count("*").alias("n_hit"))))
        .join(F.broadcast(n_docs_row))
    )
    total_pairs = F.expr("n_docs * (n_docs - 1) div 2")
    return counts.select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        total_pairs.alias("total_pairs"),
        F.col("n_true").cast("bigint").alias("n_true"),
        F.col("n_cand").cast("bigint").alias("n_cand"),
        F.col("n_hit").cast("bigint").alias("n_hit"),
        # NULL (not inf/nan) on empty truth/candidate sets, matching the
        # oracle's NULLIF guards — DuckDB would emit IEEE inf on a bare /0.
        F.when(F.col("n_true") != 0, F.col("n_hit").cast("double") / F.col("n_true")).alias(
            "pair_completeness"
        ),
        F.when(F.col("n_cand") != 0, F.col("n_hit").cast("double") / F.col("n_cand")).alias(
            "precision_at_block"
        ),
        F.when(
            total_pairs != 0,
            F.lit(1.0) - F.col("n_cand").cast("double") / total_pairs.cast("double"),
        ).alias("reduction_ratio"),
    )


# ---------------------------------------------------------------------------
# 15. signature-accuracy audit (estimate vs exact, per pair)
# ---------------------------------------------------------------------------


def _sig_match_sql() -> str:
    terms = " + ".join(
        f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(NUM_HASHES)
    )
    return terms


@register(
    "q_dedup_minhash_accuracy",
    oracle=f"""
    WITH {_SHINGLES_SQL.strip()},
    {_minhash_sql().strip()},
    {_JACCARD_PAIRS_SQL.strip()}
    SELECT c.doc_a, c.doc_b,
           CAST(({_sig_match_sql()}) AS BIGINT) AS n_agree,
           CAST(({_sig_match_sql()}) AS DOUBLE) / {NUM_HASHES} AS jaccard_est,
           j.jaccard AS jaccard_true,
           ABS(CAST(({_sig_match_sql()}) AS DOUBLE) / {NUM_HASHES} - j.jaccard)
               AS abs_err
    FROM candidates c
    JOIN sig sa ON c.doc_a = sa.doc_id
    JOIN sig sb ON c.doc_b = sb.doc_id
    JOIN jaccard_pairs j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
    """,
    doc=f"MinHash signature-accuracy audit: for every LSH candidate pair, "
    f"the sketch estimate (fraction of the {NUM_HASHES} minhashes that "
    "agree) side by side with the exact shingle Jaccard and the absolute "
    "error, PER PAIR — no error aggregation, so every value is a ratio "
    "of integers or an identical IEEE subtraction and the whole audit "
    "is bit-exact cross-engine. MEASURED FINDING (pinned in "
    "tests/test_dedup_property.py): with the Kirsch-Mitzenmacher "
    "double-hashed family (mh_i = min(b1 + i*b2), chosen for oracle "
    "reproducibility at 2 md5s/row), the k coordinates are strongly "
    "correlated — the same shingle tends to win the min for every i — "
    "so per-pair estimates are BIMODAL (mean |err| ~0.5 on the fixture, "
    "far over the sqrt(J(1-J)/k) binomial envelope of independent "
    "permutations). Banding still works (bucket collisions only need "
    "SOME coordinate agreement), which is why q_dedup_blocking_quality "
    "shows full pair completeness — but the estimate must never "
    "substitute for verification, and verify_jaccard's exact pass "
    "exists precisely because of this. Production swap for calibrated "
    "estimates: k INDEPENDENTLY seeded hashes (seeded xxhash64, "
    "hashing.py scale note) — k times the hash cost, binomial accuracy. "
    "At 100 TB: candidates-only, two doc_id-keyed signature joins, "
    "audit-sample scale like the blocking audit.",
    tags=("dedup", "llm", "eval"),
)
def q_dedup_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    shs = materialize(shingle_arrays(fan_out(load(spark, sf_dir, "documents"))))
    exploded = shs.select("doc_id", F.explode("shs").alias("shingle"))
    sig = materialize(minhash_signatures(exploded))
    cand = lsh_candidate_pairs(sig)
    truth = jaccard_pairs(exploded, shs_arrays=shs)
    # one expression string instead of a NUM_HASHES when/otherwise builder
    # loop (round 13, VERDICT item 7) — same CASE arithmetic, 1 py4j call
    agree = F.expr(
        " + ".join(
            f"(CASE WHEN __a.mh_{i} = __b.mh_{i} THEN 1 ELSE 0 END)"
            for i in range(NUM_HASHES)
        )
    )
    est = agree.cast("double") / F.lit(float(NUM_HASHES))
    return (
        cand.join(sig.alias("__a"), F.col("doc_a") == F.col("__a.doc_id"))
        .join(sig.alias("__b"), F.col("doc_b") == F.col("__b.doc_id"))
        .join(truth, ["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            agree.cast("bigint").alias("n_agree"),
            est.alias("jaccard_est"),
            F.col("jaccard").alias("jaccard_true"),
            F.abs(est - F.col("jaccard")).alias("abs_err"),
        )
    )
