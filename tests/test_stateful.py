"""Stateful-streaming test: per-user running totals must survive across
micro-batches (state store) and converge to the batch ground truth."""

from __future__ import annotations

import pytest

from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.streaming.stateful import running_user_totals


def test_running_totals_across_microbatches(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events").select("user_id", "value").limit(2000)
    src = str(tmp_path / "events_src")
    # several files -> maxFilesPerTrigger=1 forces MULTIPLE micro-batches,
    # so correctness requires state to persist between them
    ev.repartition(4).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last emitted update per user == the final running total
    updates = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
            FROM running_totals
        ) WHERE rn = 1
        """
    ).collect()
    got = {r.user_id: (r.n_events, r.total_value) for r in updates}

    batch = ev.groupBy("user_id").agg({"value": "sum", "*": "count"}).collect()
    expected = {r.user_id: (r["count(1)"], r["sum(value)"]) for r in batch}

    assert set(got) == set(expected)
    multi_update_users = spark.sql(
        "SELECT COUNT(*) c FROM (SELECT user_id, COUNT(*) c2 FROM running_totals GROUP BY user_id HAVING COUNT(*) > 1)"
    ).collect()[0].c
    assert multi_update_users > 0, "test must actually exercise multi-batch state"
    for uid, (n, total) in expected.items():
        assert got[uid][0] == n
        assert got[uid][1] == pytest.approx(total, rel=1e-9)
