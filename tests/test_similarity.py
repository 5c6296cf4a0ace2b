"""ANN quality gate: the approximate IVF path must recover >= 90% of the
exact brute-force top-k (it cannot be oracled — it is approximate by
design, so the driver only row-checks it; THIS is its correctness test)."""

from __future__ import annotations

from sales_data_pipeline_gcp_spark.operators.similarity import TOP_K, q_sim_ann_ivf, q_sim_topk


def test_ann_recall(spark, sf_dir):
    exact = {r.vec_id for r in q_sim_topk(spark, sf_dir).collect()}
    approx = {r.vec_id for r in q_sim_ann_ivf(spark, sf_dir).collect()}
    assert len(exact) == TOP_K
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"ANN recall@{TOP_K} = {recall}"


def test_ann_scores_match_exact_for_shared_hits(spark, sf_dir):
    exact = {r.vec_id: r.cosine for r in q_sim_topk(spark, sf_dir).collect()}
    approx = {r.vec_id: r.cosine for r in q_sim_ann_ivf(spark, sf_dir).collect()}
    for vid in set(exact) & set(approx):
        assert exact[vid] == approx[vid]  # same fold order -> bit-identical
