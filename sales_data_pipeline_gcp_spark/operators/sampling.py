"""Sampling operators for training-data pipelines, plus the vectorized
scalar Pandas-UDF surface (SURVEY.md §2.5).

- ``q_sample_hash``: hash-based deterministic sampling — THE reproducible
  sampling pattern at scale: membership depends only on the key, so the
  sample is stable across runs, retries, and cluster sizes, and can be
  recomputed years later. Fully oracled (shared hash family).
- ``q_sample_stratified``: per-stratum rates via ``sampleBy`` (seeded
  Bernoulli) — rows-only; statistical bounds gated in tests.
- ``q_udf_vectorized``: a scalar ``@pandas_udf`` (Arrow-vectorized token
  counter) held to an exact SQL oracle — the approved shape for Python
  logic that must run per-row at scale (never row-at-a-time ``F.udf``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sales_data_pipeline_gcp_spark.functions.hashing import shared_hash, sql_shared_hash
from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.plans.registry import register

SAMPLE_PCT = 10
STRATA_RATES = {"en": 0.5, "de": 0.2, "fr": 0.2, "es": 0.2, "zh": 0.2}


@register(
    "q_sample_hash",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {sql_shared_hash("CAST(doc_id AS VARCHAR)")} % 100 < {SAMPLE_PCT}
    """,
    doc=f"Deterministic {SAMPLE_PCT}% sample by key-hash: membership is a "
    "pure function of doc_id, so the sample is identical on every run, "
    "every cluster size, and in the oracle. The pattern to use when a "
    "sample must be citable/reproducible (eval splits, ablations).",
    tags=("sampling",),
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bucket = shared_hash(F.col("doc_id").cast("string")) % 100
    return d.filter(bucket < SAMPLE_PCT).select("doc_id", "lang", "n_chars")


@register(
    "q_sample_stratified",
    oracle=None,  # seeded Bernoulli; statistical bounds gated in tests
    doc="Stratified sampling via sampleBy (per-language rates, fixed seed): "
    "up-samples the rarer languages relative to 'en' — the class-balance "
    "move in corpus construction. Row-level membership is seed-stable "
    "within a Spark version but not cross-engine, hence rows-only.",
    tags=("sampling",),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.sampleBy("lang", STRATA_RATES, seed=42).select("doc_id", "lang", "n_chars")


#: Target language mixture for q_domain_mix — the corpus-composition
#: weights a training run pins (e.g. upweighting English): each stratum is
#: downsampled (never upsampled) so the OUTPUT proportions hit the target
#: exactly, with the kept rows chosen deterministically by key-hash rank.
MIX_TARGET = {"en": 0.4, "de": 0.15, "fr": 0.15, "es": 0.15, "zh": 0.15}

_MIX_VALUES = ", ".join(f"('{k}', {v})" for k, v in MIX_TARGET.items())


@register(
    "q_domain_mix",
    oracle=f"""
    WITH tgt(lang, share) AS (VALUES {_MIX_VALUES}),
    cnt AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
    scale AS (SELECT MIN(c / share) AS s FROM cnt JOIN tgt USING (lang)),
    quota AS (
        SELECT lang, CAST(FLOOR(share * (SELECT s FROM scale)) AS BIGINT)
               AS n_keep
        FROM tgt
    ),
    ranked AS (
        SELECT doc_id, lang, source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY {sql_shared_hash("CAST(doc_id AS VARCHAR)")}, doc_id
               ) AS rn
        FROM documents
    )
    SELECT r.doc_id, r.lang, r.source, r.n_chars
    FROM ranked r JOIN quota q ON r.lang = q.lang
    WHERE r.rn <= q.n_keep
    """,
    doc="Domain/language mixture resampling — the corpus-composition op: "
    "given target proportions per stratum, downsample each stratum to an "
    "EXACT per-stratum quota (the largest output achievable without "
    "upsampling: scale = min over strata of count/share), keeping the "
    "docs with the smallest key-hash — deterministic, reproducible, and "
    "stable under reruns, unlike seeded Bernoulli. Plan: tiny per-stratum "
    "count agg -> scalar scale -> broadcast quota joined onto a "
    "rank-per-stratum window. The exact-quota rank is a per-stratum total "
    "order; at 100 TB with few strata you'd swap the window for a "
    "hash-threshold cut (approx quantile of the hash per stratum) to "
    "avoid single-reducer strata — documented tradeoff: exact counts "
    "here, threshold-approximate counts at extreme scale.",
    tags=("sampling",),
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tgt = spark.createDataFrame(
        list(MIX_TARGET.items()), "lang string, share double"
    )
    cnt = d.groupBy("lang").agg(F.count("*").alias("c"))
    scale = (
        cnt.join(tgt, "lang")
        .agg(F.min(F.col("c") / F.col("share")).alias("s"))
    )
    quota = (
        tgt.crossJoin(F.broadcast(scale))
        .select("lang", F.floor(F.col("share") * F.col("s")).cast("bigint").alias("n_keep"))
    )
    rn = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            shared_hash(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
        )
    )
    return (
        d.withColumn("rn", rn)
        .join(F.broadcast(quota), "lang")
        .filter(F.col("rn") <= F.col("n_keep"))
        .select("doc_id", "lang", "source", "n_chars")
    )


@F.pandas_udf(T.LongType())
def _count_tokens(texts: pd.Series) -> pd.Series:
    # Arrow-vectorized: one Python call per batch, not per row
    return texts.str.split(" ").map(lambda ws: sum(1 for w in ws if w != ""))


@register(
    "q_udf_vectorized",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens
    FROM documents
    """,
    doc="Vectorized scalar Pandas UDF (Arrow batches) counting tokens, held "
    "to the exact declarative oracle — demonstrates the ONLY acceptable "
    "per-row Python shape; integer output makes Python==SQL exact.",
    tags=("udf",),
)
def q_udf_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", _count_tokens(F.col("text")).alias("n_tokens"))


#: Systematic PPS: picks per stratum, and the Knuth multiplicative
#: constant that deterministically permutes the sort order.
PPS_PER_STRATUM = 20
PPS_KNUTH = 2654435761
PPS_MOD = 4294967296


@register(
    "q_sample_pps",
    oracle=f"""
    WITH weighted AS (
        SELECT o_orderpriority AS pri, o_orderkey,
               (o_orderkey * {PPS_KNUTH}) % {PPS_MOD} AS perm,
               CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS BIGINT) AS w
        FROM orders
    ), cum AS (
        SELECT pri, o_orderkey, perm, w,
               SUM(w) OVER (PARTITION BY pri ORDER BY perm, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cumw,
               SUM(w) OVER (PARTITION BY pri) AS total_w
        FROM weighted
    )
    SELECT pri, o_orderkey, w,
           CAST((cumw * {PPS_PER_STRATUM}) // total_w
                - ((cumw - w) * {PPS_PER_STRATUM}) // total_w AS BIGINT)
             AS n_units
    FROM cum
    WHERE (cumw * {PPS_PER_STRATUM}) // total_w
            > ((cumw - w) * {PPS_PER_STRATUM}) // total_w
    """,
    doc="Systematic probability-proportional-to-size sampling per order "
    f"priority ({PPS_PER_STRATUM} units per stratum): rows are laid out "
    "in a DETERMINISTIC pseudo-random order (Knuth multiplicative "
    "permutation of the order key — odd multiplier mod 2^32 is a "
    "bijection, so no engine-specific hash enters the plan), integer "
    "cent-weights accumulate along that order, and a row is selected "
    "when its cumulative-weight interval contains one of the k evenly "
    "spaced skip boundaries — the classic PPS design (inclusion "
    "probability proportional to order value, large 'certainty units' "
    "can absorb several boundaries, reported as n_units). Every "
    "comparison is integer floor-division, so the sample is bit-"
    "reproducible cross-engine — unlike weighted reservoir designs "
    "(Efraimidis-Spirakis) whose u^(1/w) keys differ by ulps across "
    "pow() implementations. At 100 TB: stratum-keyed window sort, "
    "parallel across strata; cumw*k stays far under int64 up to "
    "~10^14 cents per stratum, beyond which the accumulation column "
    "switches to DECIMAL(38,0) with the same semantics.",
    tags=("sampling",),
)
def q_sample_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from sales_data_pipeline_gcp_spark.functions.exact import dec

    o = load(spark, sf_dir, "orders")
    weighted = o.select(
        F.col("o_orderpriority").alias("pri"),
        "o_orderkey",
        ((F.col("o_orderkey") * PPS_KNUTH) % PPS_MOD).alias("perm"),
        dec(F.col("o_totalprice") * 100, 0).cast("long").alias("w"),
    )
    wcum = W.partitionBy("pri").orderBy("perm", "o_orderkey").rowsBetween(
        W.unboundedPreceding, 0
    )
    wtot = W.partitionBy("pri")
    cum = weighted.select(
        "pri",
        "o_orderkey",
        "w",
        F.sum("w").over(wcum).alias("cumw"),
        F.sum("w").over(wtot).alias("total_w"),
    )
    hi = F.expr(f"(cumw * {PPS_PER_STRATUM}) div total_w")
    lo = F.expr(f"((cumw - w) * {PPS_PER_STRATUM}) div total_w")
    return cum.filter(hi > lo).select(
        "pri", "o_orderkey", "w", (hi - lo).alias("n_units")
    )
