"""Error-bound gates for the approximate aggregates (rows-only for the
driver; this is their correctness test)."""

from __future__ import annotations


def test_approx_error_bounds(spark, sf_dir):
    from sales_data_pipeline_gcp_spark.operators.subqueries import q_agg_approx

    for r in q_agg_approx(spark, sf_dir).collect():
        assert abs(r.approx_orders - r.exact_orders) / r.exact_orders < 0.05, r
        assert abs(r.approx_median - r.exact_median) / r.exact_median < 0.05, r
