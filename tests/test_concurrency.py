"""Concurrency smoke: declared queries must be safe to run from multiple
threads on one SparkSession (a driver/harness may parallelize); guards
against shared mutable state in query functions (e.g. temp-view name
collisions)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from sales_data_pipeline_gcp_spark.plans import registry

NAMES = [
    "q_agg_group",
    "q_subquery_scalar",      # uses temp views
    "q_subquery_correlated",  # uses the same temp views concurrently
    "q_join_star",
    "q_text_tokens",
    "q_sample_hash",
    "q_window_rank",
    "q_dedup_exact",
]


def test_parallel_query_execution(spark, sf_dir):
    qs = registry.all_queries()

    def run(name):
        return name, qs[name].fn(spark, sf_dir).count()

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = dict(ex.map(run, NAMES * 2))
    assert set(results) == set(NAMES)
    assert all(v > 0 for v in results.values())
