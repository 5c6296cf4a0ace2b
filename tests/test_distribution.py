"""Independent property checks for the distribution-statistics operators
(distribution.py) — brute-force numpy recomputations and closed-form
invariants at smoke scale, NOT the DuckDB oracle (tests/test_parity.py
already runs that for every declared query)."""

from __future__ import annotations

import numpy as np

from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.operators.distribution import (
    BOLL_WINDOW,
    KS_GROUP_A,
    KS_GROUP_B,
    q_bollinger_bands,
    q_cusum_changepoint,
    q_dow_seasonality,
    q_gini_concentration,
    q_ks_test,
    q_mix_effective_sources,
    q_spearman_corr,
)

from tests.conftest import SF_SMOKE


def _avg_ranks(v: np.ndarray) -> np.ndarray:
    """Average ranks with ties (1-based), the textbook Spearman input."""
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v), dtype=float)
    i = 0
    sv = v[order]
    while i < len(v):
        j = i
        while j + 1 < len(v) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


def test_gini_matches_bruteforce(spark):
    rows = {int(r.nationkey): r for r in q_gini_concentration(spark, SF_SMOKE).collect()}
    o = load(spark, SF_SMOKE, "orders")
    c = load(spark, SF_SMOKE, "customer")
    per = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    by_nation: dict[int, list[int]] = {}
    for r in per:
        by_nation.setdefault(int(r.c_nationkey), []).append(round(r["sum(o_totalprice)"] * 100))
    assert set(rows) == set(by_nation)
    for nk, revs in by_nation.items():
        x = np.sort(np.array(revs, dtype=float))
        n = len(x)
        i = np.arange(1, n + 1)
        expected = (2 * (i * x).sum() - (n + 1) * x.sum()) / (n * x.sum())
        got = rows[nk].gini
        assert abs(got - expected) < 1e-9, (nk, got, expected)
        assert 0.0 <= got < 1.0
        assert rows[nk].n_customers == n


def test_spearman_matches_bruteforce(spark):
    row = q_spearman_corr(spark, SF_SMOKE).collect()[0]
    p = load(spark, SF_SMOKE, "part").select("p_retailprice", "p_size").collect()
    price = np.array([round(float(r.p_retailprice) * 100) for r in p], dtype=float)
    size = np.array([int(r.p_size) for r in p], dtype=float)
    rx, ry = _avg_ranks(price), _avg_ranks(size)
    expected = np.corrcoef(rx, ry)[0, 1]
    assert row.n_parts == len(p)
    assert abs(row.spearman_rho - expected) < 1e-9
    assert -1.0 <= row.spearman_rho <= 1.0


def test_ks_matches_bruteforce(spark):
    row = q_ks_test(spark, SF_SMOKE).collect()[0]
    o = load(spark, SF_SMOKE, "orders").select("o_orderstatus", "o_totalprice").collect()
    a = np.sort([round(float(r.o_totalprice) * 100) for r in o if r.o_orderstatus == KS_GROUP_A])
    b = np.sort([round(float(r.o_totalprice) * 100) for r in o if r.o_orderstatus == KS_GROUP_B])
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    expected = np.abs(fa - fb).max()
    assert row.n_a == len(a) and row.n_b == len(b)
    assert abs(row.ks_stat - expected) < 1e-12
    assert 0.0 <= row.ks_stat <= 1.0
    # reported location is a point achieving the max (earliest such)
    at_idx = np.where(np.isclose(np.abs(fa - fb), expected))[0][0]
    assert round(row.ks_at * 100) == int(grid[at_idx])


def test_bollinger_bands_shape_and_flags(spark):
    rows = sorted(q_bollinger_bands(spark, SF_SMOKE).collect(), key=lambda r: r.d)
    daily = (
        load(spark, SF_SMOKE, "orders").groupBy("o_orderdate").count().collect()
    )
    assert len(rows) == len(daily) - (BOLL_WINDOW - 1)
    for r in rows:
        assert abs((r.upper_band + r.lower_band) / 2 - r.ma) < 1e-6
        assert r.sd >= 0
        if r.breakout == 1:
            assert r.revenue > r.upper_band
        elif r.breakout == -1:
            assert r.revenue < r.lower_band
        else:
            assert r.lower_band - 1e-9 <= r.revenue <= r.upper_band + 1e-9


def test_cusum_matches_bruteforce_per_type(spark):
    rows = {r.event_type: r for r in q_cusum_changepoint(spark, SF_SMOKE).collect()}
    ev = load(spark, SF_SMOKE, "events").select("event_type", "ts").collect()
    ns_day = 86400 * 10**9
    by_type: dict[str, dict[int, int]] = {}
    for r in ev:
        d = int(r.ts) // ns_day
        by_type.setdefault(r.event_type, {})[d] = by_type.setdefault(r.event_type, {}).get(d, 0) + 1
    assert set(rows) == set(by_type)
    for et, daily in by_type.items():
        days = sorted(daily)
        counts = np.array([daily[d] for d in days], dtype=np.int64)
        n, total = len(days), counts.sum()
        cum = np.cumsum(counts)
        k = np.arange(1, n + 1)
        dnum = np.abs(n * cum - k * total)
        got = rows[et]
        assert got.n_days == n and got.total_events == total
        assert got.d_num == dnum.max()
        assert got.change_day == days[int(np.argmax(dnum))]


def test_dow_seasonality_weighted_mean_is_one(spark):
    rows = q_dow_seasonality(spark, SF_SMOKE).collect()
    assert {r.dow for r in rows} <= set(range(7))
    wsum = sum(r.seasonal_index * r.n_days for r in rows)
    nsum = sum(r.n_days for r in rows)
    # weighted mean of the index over days is exactly 1 by construction
    assert abs(wsum / nsum - 1.0) < 1e-9
    for r in rows:
        assert r.seasonal_index > 0


def test_mix_effective_sources_bounds(spark):
    rows = q_mix_effective_sources(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1.0 - 1e-9 <= r.effective_sources <= r.n_sources + 1e-9
        assert 1.0 / r.n_sources - 1e-9 <= r.dominance <= 1.0
        assert r.n_docs >= r.n_sources
