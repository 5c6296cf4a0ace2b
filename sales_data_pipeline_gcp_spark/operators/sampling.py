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
