"""One-off probe (round-8 VERDICT item 6): attribute the streaming-floor
per-sweep variance (16.5-27.9s spread on fixture-fixed ~100-row inputs) to
checkpoint-filesystem round-trips vs micro-batch scheduling.

Method: the stream-stream join queries create their checkpoint/sink dirs
via tempfile.mkdtemp, which honors TMPDIR — so running the same query with
TMPDIR=/tmp (ext4, the bench default) vs TMPDIR=/dev/shm (tmpfs) isolates
the filesystem term while everything else (session conf, fixture, state
store count) stays fixed. Fresh process per run, A/B interleaved so host
drift hits both arms equally. Result paragraph goes to BENCH_NOTES.md;
this probe is kept for reproducibility, not wired into the bench.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

QUERIES = ("q_stream_join", "q_stream_join_outer")
RUNS = 4  # per arm per query, interleaved


def _worker(name: str) -> None:
    sys.path.insert(0, HERE)
    from sales_data_pipeline_gcp_spark.plans import registry
    from sales_data_pipeline_gcp_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(f"floor-probe-{name}")
    q = registry.all_queries()[name]
    t0 = time.perf_counter()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"RESULT|{time.perf_counter() - t0:.2f}", flush=True)
    spark.stop()


def main() -> None:
    out: dict[str, dict[str, list[float]]] = {q: {"ext4": [], "tmpfs": []} for q in QUERIES}
    for i in range(RUNS):
        for name in QUERIES:
            for arm, tmpdir in (("ext4", "/tmp"), ("tmpfs", "/dev/shm")):
                env = dict(os.environ, TMPDIR=tmpdir)
                t0 = time.perf_counter()
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--worker", name],
                    capture_output=True,
                    text=True,
                    env=env,
                    timeout=600,
                )
                lines = [l for l in proc.stdout.splitlines() if l.startswith("RESULT|")]
                sec = float(lines[-1].removeprefix("RESULT|")) if lines else -1.0
                out[name][arm].append(sec)
                print(
                    f"run {i} {name} {arm}: query {sec:.2f}s "
                    f"(proc {time.perf_counter() - t0:.1f}s)",
                    flush=True,
                )
    for name in QUERIES:
        for arm in ("ext4", "tmpfs"):
            xs = out[name][arm]
            print(
                f"{name} {arm}: min {min(xs):.2f} median {statistics.median(xs):.2f} "
                f"max {max(xs):.2f} spread {max(xs) - min(xs):.2f}"
            )
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        _worker(sys.argv[2])
    else:
        main()
