"""sf1 CORRECTNESS parity (round-7 VERDICT item 2): run the DuckDB oracle
differential over the DERIVED sf1 fixtures (.scale/sf1, ~6M lineitem rows
— see scale_fixtures.py) for the 13 cost-leader families plus the
decimal-exact aggregation queries, and commit the per-query
rows/schema/hash record as PARITY_SF1.json.

Why this exists: driver adjudication runs at sf0.01 (~60k lineitem rows),
which cannot expose 6M-row accumulator drift — the decimal-exact
aggregation contract (partial-aggregation-order-independent doubles) and
the candidate-set algorithms' exactness claims were previously proven only
at small SF; SCALING.md measured their sf1 COST but not their sf1
correctness. This harness runs each query's Spark plan AND its embedded
DuckDB oracle on the same sf1 parquet and compares row count, dtype-kind
schema, and an order-insensitive canonical value hash (the same
canonicalization as tests/parity.py, which mirrors the driver's).

Each query runs in a FRESH subprocess with a wall-clock budget: the exact
all-pairs completeness oracles (q_dedup_prefix_filter / q_graph_triangles
share the quadratic co-shingle pairs CTE) are superlinear BY DESIGN, and
on the vocabulary-saturated derived fixture the DuckDB side may exceed any
reasonable budget — a timeout is recorded honestly as ``err: timeout``
rather than silently skipped, and those queries also run against the
fresh-vocabulary sf1 variant (.scale/sf1fv) where the co-shingle pair
volume scales the way a real corpus's would.

Coverage boundary (round 9): the sweep targets every oracled query whose
OUTPUT is bounded (aggregates, top-k, per-group rollups — <= ~2000 rows at
sf0.01, so <= ~200k at sf1). Row-identity queries (projections, filters,
per-row scalar maps, full-table windows: q_math_scalars, q_unpivot,
q_window_lag/range/firstlast, q_json_extract, q_map_functions,
q_scd2_intervals) are excluded ON PURPOSE, not for convenience: they carry
no accumulator whose value depends on magnitude — scale changes row COUNT,
not per-row arithmetic — so the sf0.1 gate (238 oracle tests, every round)
already proves everything sf1 could, while hashing millions of pandas rows
would cost hours. q_dedup_simhash is also excluded: the derived fixture's
10x replicas inflate its near-dup PAIR output quadratically (a fixture
artifact, not a scale property; its cost bracket lives in SCALING.md).

Usage:
    python parity_sf1.py            # full set -> PARITY_SF1.json
    python parity_sf1.py q_a q_b    # subset (still merges into the record)
    python parity_sf1.py --all-oracled [q_a ...]  # coverage top-up over
        every oracled registry query (honor the boundary above when
        choosing names)
    python parity_sf1.py --sf10 [q_a ...]   # third-decade spot check,
        SF10_WHITELIST only (see below) -> "sf10_decimal_exact" section
    python parity_sf1.py --merge-records shard.json [...]  # fold parallel
        PARITY_SF1_OUT shard records into the canonical file
Env: PARITY_SF1_TIMEOUT (sec/query, default 1800); PARITY_SF1_OUT
(record path override for parallel shards).
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

SF1_DIR = os.path.join(HERE, ".scale", "sf1")
SF1FV_DIR = os.path.join(HERE, ".scale", "sf1fv")
#: PARITY_SF1_OUT overrides the record path so parallel shard instances
#: (disjoint name subsets) can write race-free private records, merged
#: into the committed file afterward by merge_records().
OUT = os.environ.get("PARITY_SF1_OUT", os.path.join(HERE, "PARITY_SF1.json"))

#: the 13 cost-leader families of scale_report.SF1_QUERIES (q_stream_join
#: has no oracle -> rows-only, recorded as such) + the decimal-exact
#: aggregation class the round-7 verdict named (overflow/drift-exposed).
QUERIES: tuple[str, ...] = (
    "q_dedup_prefix_filter",
    "q_graph_triangles",
    "q_graph_triangles_lsh",
    "q_dedup_clusters",
    "q_dedup_minhash",
    "q_dedup_snm",
    "q_corpus_prepare",
    "q_pagerank",
    "q_graph_khop",
    "q_graph_sssp",
    "q_sim_pq_adc",
    "q_sim_ann_ivf",
    "q_stream_join",
    # decimal-exact aggregation contract at 6M rows
    "q_tpch_q1_pricing",
    "q_agg_group",
    "q_price_index",
    # scale-0 cents-unit moment sums (sxy ~4.5e16 scaled at sf1 — past
    # the 2^53 direct-cast boundary; string-routed in round 9, kept here
    # as the regression check — see the functions/exact.py ledger)
    "q_agg_stats",
    "q_ols_regression",
    # scale-12 contrib sum ~1e16 scaled at sf1 — string-routed in round 9
    # (the first scale-12 string route; exactness argued in
    # functions/exact.py, verified here)
    "q_chisq_independence",
)

#: Round-9 coverage extension (round-8 VERDICT item 4): the next-largest
#: aggregate-bearing families — events, timeseries, ML-prep, analytics,
#: distribution, and the rest of stats. Their aggregates route through the
#: same functions/exact.py helpers as the proven set, but "inferred" is
#: not "measured": run once per round until all 231 oracled queries carry
#: an sf1 row. Includes the round-9 string-route free-riders (sessionize,
#: event_rates, outlier_zscore, bollinger regression check).
EXTENSION_QUERIES: tuple[str, ...] = (
    "q_funnel",
    "q_sessionize",
    "q_event_rates",
    "q_events_retention",
    "q_outlier_zscore",
    "q_window_rolling_days",
    "q_timeseries_gapfill",
    "q_event_transitions",
    "q_time_weighted_avg",
    "q_gaps_islands",
    "q_cohort_ltv",
    "q_cumulative_users",
    "q_event_paths",
    "q_rolling_distinct_users",
    "q_funnel_steps",
    "q_peak_concurrency",
    "q_histogram",
    "q_relational_division",
    "q_dq_profile",
    "q_outlier_mad",
    "q_weighted_median",
    "q_pareto_abc",
    "q_ab_ttest",
    "q_winsorized_mean",
    "q_basket_lift",
    "q_benford_digits",
    "q_dq_linenumbers",
    "q_mannwhitney",
    "q_dq_referential",
    "q_decayed_avg",
    "q_timeseries_interpolate",
    "q_events_anomaly",
    "q_rolling_corr",
    "q_acf",
    "q_calendarize",
    "q_capped_runsum",
    "q_rfm",
    "q_purchase_intervals",
    "q_attribution",
    "q_skyline",
    "q_xyz_analysis",
    "q_item_cf",
    "q_gini_concentration",
    "q_spearman_corr",
    "q_ks_test",
    "q_bollinger_bands",
    "q_cusum_changepoint",
    "q_dow_seasonality",
    "q_mix_effective_sources",
    "q_label_window",
    "q_train_test_split",
    "q_tv_drift",
    "q_window_median",
    "q_feature_hash",
    "q_lift_curve",
    "q_window_hampel",
)

#: df-sensitive families re-run on the fresh-vocabulary variant (realistic
#: Heaps-law decade next to the saturated worst case — VERDICT item 4).
FV_QUERIES: tuple[str, ...] = (
    "q_dedup_prefix_filter",
    "q_graph_triangles",
    "q_graph_triangles_lsh",
    "q_dedup_minhash",
    # both sf1 decades are hash-green since the round-9 exact-collapse
    # rewrite + the default 1800s budget (the 900s sweep budget could
    # never fit the brute-force oracle's ~620s saturated-DP bill alone);
    # kept on the fv list because its block-pair volume is the
    # df-sensitive quantity the fv/saturated bracket disambiguates
    "q_dedup_fuzzy",
)

#: The ONLY oracled queries allowed to carry no sf1 parity row (round-9
#: VERDICT item 5 — previously this set was named only in the committed
#: record's meta string, so a new query could silently skip sf1 parity).
#: Exclusion rationale (see the module docstring's coverage boundary):
#: eight are row-identity per-row transforms with O(N)-row output whose
#: arithmetic is magnitude-independent (scale changes row COUNT, not
#: per-row values — the per-round sf0.1 gate already proves everything sf1
#: could, while hashing millions of pandas rows costs hours);
#: q_dedup_simhash's near-dup PAIR output is inflated quadratically by the
#: derived fixture's 10x replicas (a fixture artifact — its cost bracket
#: lives in SCALING.md). tests/test_plan_lint.py::test_sf1_parity_coverage
#: asserts every other oracled query has an sf1 row, and that this set
#: never grows (ratchet, same pattern as DIRECT_CAST_LEGACY): adding a
#: name here fails the lint until the lint's pinned copy is consciously
#: edited in the same commit.
SF1_EXCLUDED: tuple[str, ...] = (
    "q_dedup_simhash",
    "q_json_extract",
    "q_map_functions",
    "q_math_scalars",
    "q_scd2_intervals",
    "q_unpivot",
    "q_window_firstlast",
    "q_window_lag",
    "q_window_range",
)

SF10_DIR = os.path.join(HERE, ".scale", "sf10")

#: .scale/sf10 replicates ONLY lineitem (10 key-shifted sf1 replicas);
#: every other table is a symlink to ../sf1, so any query joining lineitem
#: to a dimension silently inner-join-drops ~90% of the shifted keys. The
#: harness therefore REFUSES to run a non-whitelisted query against sf10
#: (round-8 ADVICE): the whitelist is the lineitem-only aggregation class
#: (including q_join_salted, whose dim is derived FROM lineitem).
SF10_WHITELIST: tuple[str, ...] = (
    "q_agg_group",
    "q_agg_stats",
    "q_tpch_q1_pricing",
    "q_agg_rollup",
    "q_agg_grouping_sets",
    "q_agg_salted",
    "q_join_salted",
)


def _duck_views_sql(sf_dir: str) -> list[str]:
    """View DDL for DuckDB over a fixture dir; Spark writes each table as
    a directory of part files, the driver fixtures as a single file."""
    from sales_data_pipeline_gcp_spark.io import TABLES

    stmts = []
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        stmts.append(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return stmts


def _hash_canon(rows) -> str:
    h = hashlib.md5()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()


def _worker(name: str, sf_dir: str) -> None:
    """Fresh-process: run one query's Spark plan + oracle at sf_dir and
    print one RESULT| JSON line."""
    import duckdb

    from sales_data_pipeline_gcp_spark.plans import registry
    from sales_data_pipeline_gcp_spark.session import get_spark
    from tests.parity import _kind, canon

    q = registry.all_queries()[name]
    rec: dict = {"sf_dir": os.path.relpath(sf_dir, HERE)}
    spark = get_spark(f"parity-sf1-{name}")
    t0 = time.perf_counter()
    got = q.fn(spark, sf_dir).toPandas()
    rec["spark_sec"] = round(time.perf_counter() - t0, 2)
    rec["spark_rows"] = len(got)
    if q.oracle is None:
        rec.update(err="no_oracle", rows_checked=len(got) >= 0, n_cols=len(got.columns))
    else:
        con = duckdb.connect()
        for stmt in _duck_views_sql(sf_dir):
            con.execute(stmt)
        t0 = time.perf_counter()
        exp = con.execute(q.oracle).df()
        rec["oracle_sec"] = round(time.perf_counter() - t0, 2)
        rec["oracle_rows"] = len(exp)
        rec["rows_match"] = len(got) == len(exp)
        rec["schema_match"] = sorted(got.columns) == sorted(exp.columns) and all(
            _kind(got[c].dtype) == _kind(exp[c].dtype) for c in got.columns
        )
        rec["spark_hash"] = _hash_canon(canon(got))
        rec["oracle_hash"] = _hash_canon(canon(exp))
        rec["hash_match"] = rec["spark_hash"] == rec["oracle_hash"]
        rec["err"] = None
    spark.stop()
    print("RESULT|" + json.dumps(rec), flush=True)


def main(only: list[str], sf10: bool = False, all_oracled: bool = False) -> None:
    timeout = int(os.environ.get("PARITY_SF1_TIMEOUT", "1800"))
    record: dict = {}
    if os.path.exists(OUT):
        record = json.load(open(OUT))
    if all_oracled:
        # coverage top-up: every oracled registry query (round-9 goal:
        # all 231 oracled queries carry an sf1 row), registration order
        from sales_data_pipeline_gcp_spark.plans import registry as _reg

        base = [n for n, q in _reg.all_queries().items() if q.oracle]
        jobs = [(n, SF1_DIR) for n in base if (not only or n in only)]
        results = record.setdefault("queries", {})
    elif sf10:
        bad = sorted(set(only) - set(SF10_WHITELIST))
        if bad:
            raise SystemExit(
                f"refusing to run {bad} against .scale/sf10: only lineitem "
                f"is replicated there (joins to sf1-symlinked dims drop ~90% "
                f"of shifted keys); whitelisted: {sorted(SF10_WHITELIST)}"
            )
        jobs = [(n, SF10_DIR) for n in SF10_WHITELIST if (not only or n in only)]
        results = record.setdefault("sf10_decimal_exact", {}).setdefault("queries", {})
    else:
        jobs = [(n, SF1_DIR) for n in QUERIES + EXTENSION_QUERIES] + [
            (n, SF1FV_DIR) for n in FV_QUERIES
        ]
        jobs = [(n, d) for n, d in jobs if (not only or n in only) and os.path.isdir(d)]
        results = record.setdefault("queries", {})
    for name, sf_dir in jobs:
        key = f"{name}@fv" if sf_dir == SF1FV_DIR else name
        print(f"--- {key}", flush=True)
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", name, sf_dir],
                capture_output=True,
                text=True,
                timeout=timeout,
            )
            lines = [l for l in proc.stdout.splitlines() if l.startswith("RESULT|")]
            if proc.returncode != 0 or not lines:
                results[key] = {
                    "err": f"rc={proc.returncode}",
                    "tail": (proc.stderr or proc.stdout)[-800:],
                    "sf_dir": os.path.relpath(sf_dir, HERE),
                }
            else:
                results[key] = json.loads(lines[-1].removeprefix("RESULT|"))
        except subprocess.TimeoutExpired:
            results[key] = {
                "err": "timeout",
                "timeout_sec": timeout,
                "sf_dir": os.path.relpath(sf_dir, HERE),
            }
        results[key]["wall_sec"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(results[key]), flush=True)
        # MERGE into existing meta — replacing it would drop keys other
        # writers maintain (the committed record's "coverage" narrative)
        record.setdefault("meta", {}).update(
            {
                "fixture": "derived sf1 (scale_fixtures.py): 10x sf0.1 replica union, "
                "~6M lineitem rows; @fv rows use the fresh-vocabulary documents variant",
                "comparison": "tests/parity.py canonicalization: row count + dtype-kind "
                "schema + order-insensitive md5 over canonical rows",
                "generated_by": "parity_sf1.py",
                "timeout_sec": timeout,
            }
        )
        with open(OUT, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
    ok = sum(1 for r in results.values() if r.get("hash_match"))
    print(f"done: {ok}/{len(results)} hash-green -> {OUT}")


def merge_records(shard_paths: list[str]) -> None:
    """Fold parallel shard records (PARITY_SF1_OUT instances over disjoint
    name subsets) into the canonical PARITY_SF1.json 'queries' section."""
    canonical = os.path.join(HERE, "PARITY_SF1.json")
    record = json.load(open(canonical)) if os.path.exists(canonical) else {}
    results = record.setdefault("queries", {})
    n = 0
    for p in shard_paths:
        for key, rec in json.load(open(p)).get("queries", {}).items():
            results[key] = rec
            n += 1
    with open(canonical, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    ok = sum(1 for r in results.values() if r.get("hash_match"))
    print(f"merged {n} shard rows: {ok}/{len(results)} hash-green -> {canonical}")


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], sys.argv[3])
    elif len(sys.argv) > 2 and sys.argv[1] == "--merge-records":
        merge_records(sys.argv[2:])
    else:
        argv = sys.argv[1:]
        names = [a for a in argv if not a.startswith("--")]
        main(names, sf10="--sf10" in argv, all_oracled="--all-oracled" in argv)
