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
neighbor's burst.

The driver records only a 2000-char tail of stdout (verified: rounds 1-3
all have ``parsed: null`` with a mid-dict tail), and 122+ query names at
~15 chars average cannot fit a 2000-char JSON line. So the official
record is split honestly:

- the FINAL stdout line is a complete, parseable JSON object sized to fit
  the tail: the total over ALL queries plus per-query medians for the
  SLOWEST queries (the cost leaders — exactly the rows truncation lost in
  round 3), with ``queries_omitted`` counting the fast ones cut;
- ``BENCH_FULL.json`` (committed) gets every query's sweep median PLUS an
  ``isolated`` column: the top cost leaders re-measured after the sweep
  on a FRESH SparkContext (session restart: new block manager, every
  sweep block dropped) — mid-sweep medians absorb neighbor GC/JIT
  pressure and accumulated block-manager residue and can overstate a
  cost leader ~3x (round-4 VERDICT), so the official record carries
  both numbers;
- ``bench_runs.json`` (gitignored) gets the raw per-run samples.
"""

from __future__ import annotations

import gc
import json
import os
import re
import statistics
import sys
import time

RUNS_PER_QUERY = 3
#: cost leaders re-measured in isolation after the sweep (see below).
N_ISOLATED = 10

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
        # adaptive re-measure: a >3x spread within one query's runs means an
        # environmental event (GC storm, checkpoint-block eviction) landed
        # mid-measurement — median-of-3 cannot outvote TWO polluted runs
        # (observed: [8.6, 7.9, 1.6] for a query whose steady state is
        # 1.6 s). Extra runs are cheap relative to a wrong official record.
        while len(samples) < 2 * RUNS_PER_QUERY and max(samples) > 3 * min(samples):
            gc.collect()
            t0 = time.perf_counter()
            materialize(q.fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 4))
        runs[name] = samples
        timings[name] = round(statistics.median(samples), 4)
        # drop Python refs to per-run localCheckpoint RDDs so the JVM
        # ContextCleaner can evict their blocks BETWEEN queries — otherwise
        # checkpoint blocks from every prior run pile up in the block
        # manager and a later query pays the eviction/GC bill mid-timing
        # (the round-2 37s minhash outlier class)
        gc.collect()

    total = round(sum(timings.values()), 4)

    # Sweep-contention reconciliation (round-4 VERDICT item 3): a median
    # taken mid-sweep absorbs neighbor GC/JIT pressure from 140+ adjacent
    # queries and can overstate a cost leader by up to 3x. After the sweep,
    # re-measure the N_ISOLATED slowest queries on a FRESH SparkContext:
    # in-process GC + settle proved insufficient — a 236-query sweep
    # leaves block-manager residue that kept the same-context isolated
    # column ~2x above a fresh-process measurement of the same query
    # (prefix-filter: 9.7 s same-context vs 5.4 s fresh). A session
    # restart (~10 s) drops every sweep block with the old block manager,
    # which is the dominant residue source. BENCH_FULL.json records
    # BOTH columns so the official record is self-consistent with any
    # uncontended re-measure.
    spark.stop()
    spark = get_spark("bench-isolated")
    for t in TABLES:
        load(spark, sf_dir, t).count()
    isolated: dict[str, float] = {}
    leaders = sorted(timings, key=lambda n: (-timings[n], n))[:N_ISOLATED]
    for name in leaders:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
        q = all_q[name]
        materialize(q.fn(spark, sf_dir))  # warm again post-sweep
        samples = []
        for _ in range(RUNS_PER_QUERY):
            t0 = time.perf_counter()
            materialize(q.fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 4))
        isolated[name] = round(statistics.median(samples), 4)
        runs[name + "/isolated"] = samples

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench_runs.json"), "w") as f:
        json.dump({"runs": runs, "sf": sf, "runs_per_query": RUNS_PER_QUERY}, f, indent=1, sort_keys=True)
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
        json.dump(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "isolated": isolated,
                "isolated_note": "cost leaders re-measured post-sweep on a fresh SparkContext (session restart drops all sweep blocks); 'queries' medians are taken mid-sweep and may carry neighbor GC/JIT contention plus accumulated block-manager residue",
                "sf": sf,
                "runs_per_query": RUNS_PER_QUERY,
            },
            f,
            indent=1,
            sort_keys=True,
        )

    # The FINAL stdout line is the official record and must survive the
    # driver's 2000-char stdout tail as complete, parseable JSON. All 122+
    # names cannot fit, so include the SLOWEST queries (cost leaders) up to
    # a byte budget and count the omitted cheap ones; the committed
    # BENCH_FULL.json holds every query.
    budget = 1600
    selected: dict[str, float] = {}
    for name, sec in sorted(timings.items(), key=lambda kv: (-kv[1], kv[0])):
        trial = dict(selected)
        trial[name] = sec
        if len(json.dumps(trial, separators=(",", ":"))) > budget:
            break
        selected[name] = sec
    payload = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": {n: selected[n] for n in sorted(selected)},
        "sf": sf,
        "n_queries": len(timings),
        "queries_omitted": len(timings) - len(selected),
        "full_record": "BENCH_FULL.json",
    }
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1900:  # belt-and-braces: never emit an untailable line
        raise RuntimeError(f"official bench line {len(line)} bytes > 1900")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
