"""Benchmark runner: executes the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no driver
collect). First run of each query includes JVM/codegen warmup; a shared
warmup query amortizes session start so per-query numbers reflect plan
execution.

Each query's reported time is the MEDIAN of 3 steady-state runs (after an
untimed warmup run): a single timed run on a shared box can be doubled —
or sixteen-folded, as one round-2 entry was — by one GC pause or a
neighbor's burst. The per-run values are kept in the JSON (``runs``) so
variance stays visible.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

RUNS_PER_QUERY = 3

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
    runs: dict[str, list[float]] = {}
    for name, q in sorted(all_q.items()):
        # first run pays codegen/compile; time RUNS_PER_QUERY steady-state
        # runs and report the median (outlier-proof official record)
        materialize(q.fn(spark, sf_dir))
        samples = []
        for _ in range(RUNS_PER_QUERY):
            t0 = time.perf_counter()
            materialize(q.fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 4))
        runs[name] = samples
        timings[name] = round(statistics.median(samples), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
