"""Error-bound gates for the approximate aggregates (rows-only for the
driver; this is their correctness test). The exact references are computed
HERE, not in the declared query — the production path is sketches-only."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_error_bounds(spark, sf_dir):
    from sales_data_pipeline_gcp_spark.io import load
    from sales_data_pipeline_gcp_spark.operators.subqueries import q_agg_approx

    exact = {
        r.l_returnflag: r
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("exact_median"),
        )
        .collect()
    }
    rows = q_agg_approx(spark, sf_dir).collect()
    assert set(exact) == {r.l_returnflag for r in rows}
    for r in rows:
        e = exact[r.l_returnflag]
        assert abs(r.approx_orders - e.exact_orders) / e.exact_orders < 0.05, r
        assert abs(r.approx_median - e.exact_median) / e.exact_median < 0.05, r
