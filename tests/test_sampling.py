"""Statistical bounds for the seeded stratified sample (rows-only for the
driver) and determinism of the hash sample."""

from __future__ import annotations

from sales_data_pipeline_gcp_spark.operators.sampling import (
    STRATA_RATES,
    q_sample_hash,
    q_sample_stratified,
)


def test_hash_sample_is_deterministic(spark, sf_dir):
    a = sorted(r.doc_id for r in q_sample_hash(spark, sf_dir).collect())
    b = sorted(r.doc_id for r in q_sample_hash(spark, sf_dir).collect())
    assert a == b and len(a) > 0


def test_stratified_rates_within_bounds(spark, sf_dir):
    base = {r.lang: r.n for r in spark.read.parquet(f"{sf_dir}/documents.parquet").groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    got = {r.lang: r.n for r in q_sample_stratified(spark, sf_dir).groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    for lang, rate in STRATA_RATES.items():
        frac = got.get(lang, 0) / base[lang]
        # Bernoulli: allow generous slack at these stratum sizes (~60-220)
        assert abs(frac - rate) < 0.15, (lang, frac, rate)
