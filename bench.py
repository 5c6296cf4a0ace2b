"""Benchmark runner: executes the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no driver
collect). First run of each query includes JVM/codegen warmup; a shared
warmup query amortizes session start so per-query numbers reflect plan
execution.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sales_data_pipeline_gcp_spark.plans import registry
from sales_data_pipeline_gcp_spark.session import get_spark


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    all_q = registry.all_queries()

    # warmup: touch every table + run the flagship once
    from sales_data_pipeline_gcp_spark.io import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t).count()
    materialize(all_q["q_agg_group"].fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name, q in sorted(all_q.items()):
        # first run pays codegen/compile; report the steady-state second run
        materialize(q.fn(spark, sf_dir))
        t0 = time.perf_counter()
        materialize(q.fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
