"""Plan linter: every declared query's physical plan is checked for the
anti-patterns that kill 100 TB runs — unbounded cartesian products and
Python evaluation outside the explicitly-Python operators. Runs on every
registered query so NEW operators get linted automatically."""

from __future__ import annotations

import pytest

from sales_data_pipeline_gcp_spark.plans import registry
from tests.test_plans import plan_str

ALL = registry.all_queries()

#: queries whose whole point is Arrow-batched Python
PYTHON_OK = {
    "q_grouped_trend",          # applyInPandas grouped map
    "q_multimodal_features",    # mapInPandas decode
    "q_multimodal_framesample", # mapInPandas frame sampler
    "q_multimodal_decode",      # mapInPandas header synth + parse
    "q_udf_vectorized",         # scalar pandas UDF
    "q_udtf_chunks",            # Python UDTF lateral generator
}

#: queries that broadcast a literal single-row side (query vector) — a
#: BroadcastNestedLoopJoin over one row is a constant-time operation
SINGLE_ROW_CROSS_OK = {"q_sim_topk", "q_sim_ann_ivf"}


@pytest.mark.parametrize("name", sorted(ALL), ids=sorted(ALL))
def test_plan_has_no_scale_antipatterns(spark, sf_smoke_dir, name):
    if name in ("q_stream_ingest", "q_stream_dedup"):
        pytest.skip("streaming query materializes its own pipeline")
    plan = plan_str(ALL[name].fn(spark, sf_smoke_dir))

    if name not in SINGLE_ROW_CROSS_OK:
        assert "CartesianProduct" not in plan, f"{name}: unbounded cartesian product"

    if name not in PYTHON_OK:
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            assert marker not in plan, f"{name}: unexpected Python stage {marker}"

    # row-at-a-time Python is banned EVERYWHERE, even in the Python queries
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
