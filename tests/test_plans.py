"""Physical-plan shape tests — the 100 TB design assertions (SURVEY.md §7
Phase 6). Correctness tests prove the small-SF answer; these prove the plan
is the one that survives a 1000-executor scale-up: filters reach the
parquet scan, projections prune columns, tiny dims broadcast, the cleaning
pipeline stays shuffle-free, and top-k never globally sorts."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.plans import registry

QS = registry.all_queries()


def plan_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_flagship_pushdown_and_pruning(spark, sf_dir):
    plan = plan_str(QS["q_agg_group"].fn(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns are read
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    # partial aggregation: two HashAggregates around one exchange
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) == 2


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = plan_str(QS["q_join_star"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_cleaning_is_narrow(spark, sf_dir):
    plan = plan_str(QS["q_case_impute"].fn(spark, sf_dir))
    assert "Exchange" not in plan, "cleaning pipeline must stay shuffle-free"
    # '*(n)' marks a whole-stage-codegen stage in simple mode
    assert "*(1)" in plan_str(QS["q_case_impute"].fn(spark, sf_dir), "simple")


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = plan_str(QS["q_topk"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_scalar_packs_stay_in_codegen(spark, sf_dir):
    for name in ("q_math_scalars", "q_string_scalars", "q_date_scalars"):
        plan = plan_str(QS[name].fn(spark, sf_dir), "simple")
        assert "*(1)" in plan, name
        assert "BatchEvalPython" not in plan, f"{name} must not fall back to Python UDFs"


def test_semi_anti_prefilter_pushdown(spark, sf_dir):
    # the o_totalprice filter must reach the orders scan, not run post-join
    plan = plan_str(QS["q_join_semi_anti"].fn(spark, sf_dir))
    assert "GreaterThan(o_totalprice,400000.0)" in plan


def test_window_single_shuffle(spark, sf_dir):
    plan = plan_str(QS["q_window_frame"].fn(spark, sf_dir))
    # both frames share one partitionBy -> exactly one exchange
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1


def test_ann_broadcasts_probe_side(spark, sf_dir):
    plan = plan_str(QS["q_sim_ann_ivf"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_agg_before_join_shape(spark, sf_dir):
    # q_join_outer aggregates orders BEFORE joining customers
    plan = plan_str(QS["q_join_outer"].fn(spark, sf_dir))
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1


def test_tpch_q3_filters_pushed_to_all_scans(spark, sf_dir):
    plan = plan_str(QS["q_tpch_q3_shipping"].fn(spark, sf_dir))
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan
    assert "TakeOrderedAndProject" in plan


def test_tpch_q18_semi_join_before_wide_join(spark, sf_dir):
    plan = plan_str(QS["q_tpch_q18_big_orders"].fn(spark, sf_dir))
    assert "LeftSemi" in plan
