"""Bucketing (SURVEY.md §7 Phase 6): pre-shuffled table layout so repeated
joins/aggregations on the bucket key are exchange-free. At 100 TB, bucketing
the fact tables on their join key turns every daily join from a full
shuffle into a local zip — this test proves the engine produces that plan.
"""

from __future__ import annotations

import re
import shutil

from tests.test_plans import plan_str


def test_bucketed_join_has_no_shuffle(spark, sf_smoke_dir):
    # bucketed tables land in the session's spark-warehouse dir (gitignored);
    # the catalog is per-session, so also clear stale table DIRS on disk
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_bucketed", "ord_bucketed"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)

    li = spark.read.parquet(f"{sf_smoke_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_smoke_dir}/orders.parquet")
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("li_bucketed"))
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("ord_bucketed"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # expose SMJ
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("ord_bucketed"),
            spark.table("li_bucketed").l_orderkey == spark.table("ord_bucketed").o_orderkey,
        )
        plan = plan_str(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # bucketed-bucketed equi-join: SortMergeJoin with ZERO exchanges
    assert "SortMergeJoin" in plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 0, plan

    n = joined.count()
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert n == plain

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
