"""Independent property checks for the round-5 continuation analytics
operators (analytics.py, plus the ACF / Mann-Whitney / SSSP additions) —
brute-force or closed-form recomputations at smoke scale, NOT the DuckDB
oracle (tests/test_parity.py already runs that for every declared query).
"""

from __future__ import annotations

import numpy as np

from sales_data_pipeline_gcp_spark.operators.analytics import (
    RFM_TILES,
    q_attribution,
    q_purchase_intervals,
    q_rfm,
    q_skyline,
)
from sales_data_pipeline_gcp_spark.operators.components import (
    SSSP_MAX_HOPS,
    q_graph_sssp,
)
from sales_data_pipeline_gcp_spark.operators.stats import q_mannwhitney
from sales_data_pipeline_gcp_spark.operators.timeseries import ACF_LAGS, q_acf
from sales_data_pipeline_gcp_spark.io import load

from tests.conftest import SF_SMOKE


def test_skyline_matches_bruteforce(spark):
    """Sort-based skyline == quadratic strict-dominance filter."""
    pts = [
        (int(r.p_partkey), round(float(r.p_retailprice) * 100), int(r.p_size))
        for r in load(spark, SF_SMOKE, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    expected = {
        k
        for (k, pc, sz) in pts
        if not any(pc2 < pc and sz2 > sz for (_, pc2, sz2) in pts)
    }
    got = {int(r.p_partkey) for r in q_skyline(spark, SF_SMOKE).collect()}
    assert got == expected
    # frontier is non-trivial on the fixture: strictly between 1 and all
    assert 1 <= len(got) < len(pts)


def test_rfm_tiles_balanced_and_code_consistent(spark):
    rows = q_rfm(spark, SF_SMOKE).collect()
    n = len(rows)
    for dim in ("r_tile", "f_tile", "m_tile"):
        counts = {}
        for r in rows:
            t = getattr(r, dim)
            assert 1 <= t <= RFM_TILES
            counts[t] = counts.get(t, 0) + 1
        # NTILE balance: bucket sizes differ by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1
        assert sum(counts.values()) == n
    for r in rows:
        assert r.rfm_code == r.r_tile * 100 + r.f_tile * 10 + r.m_tile
        assert r.recency_days >= 0 and r.frequency >= 1


def test_attribution_conserves_purchase_value(spark):
    """Every purchase is attributed exactly once: channel totals sum to
    the corpus purchase total (in exact cents), including 'direct'."""
    rows = q_attribution(spark, SF_SMOKE).collect()
    ev = load(spark, SF_SMOKE, "events")
    purchases = ev.filter("event_type = 'purchase'").collect()
    total_cents = sum(round(float(r.value) * 100) for r in purchases)
    got_cents = sum(round(float(r.attributed_value) * 100) for r in rows)
    assert got_cents == total_cents
    assert sum(r.n_purchases for r in rows) == len(purchases)
    assert {r.channel for r in rows} <= {"click", "view", "signup", "direct"}


def test_purchase_intervals_sum_telescopes(spark):
    """Per customer, gap sum telescopes to last-first order date."""
    import collections

    o = load(spark, SF_SMOKE, "orders").select("o_custkey", "o_orderdate").collect()
    dates = collections.defaultdict(list)
    for r in o:
        dates[int(r.o_custkey)].append(r.o_orderdate.date())
    rows = {int(r.custkey): r for r in q_purchase_intervals(spark, SF_SMOKE).collect()}
    for ck, ds in dates.items():
        if len(ds) < 2:
            assert ck not in rows
            continue
        ds.sort()
        r = rows[ck]
        assert r.n_orders == len(ds)
        assert r.n_gaps == len(ds) - 1
        span = (ds[-1] - ds[0]).days
        assert abs(r.avg_gap_days * r.n_gaps - span) < 1e-6


def test_acf_matches_numpy(spark):
    """Engine ACF == np.corrcoef on the collected daily series."""
    rows = {int(r.lag): r for r in q_acf(spark, SF_SMOKE).collect()}
    ev = load(spark, SF_SMOKE, "events").selectExpr(
        "ts div 86400000000000 AS day", "CAST(value * 100 AS DECIMAL(38,0)) AS c"
    )
    from pyspark.sql import functions as F

    daily = {
        int(r.day): int(r.c)
        for r in ev.groupBy("day").agg(F.sum("c").alias("c")).collect()
    }
    for lag in ACF_LAGS:
        xs, ys = [], []
        for d, v in daily.items():
            if d - lag in daily:
                xs.append(v)
                ys.append(daily[d - lag])
        r = rows[lag]
        assert r.n_pairs == len(xs)
        if len(xs) >= 2 and np.std(xs) > 0 and np.std(ys) > 0:
            expected = float(np.corrcoef(xs, ys)[0, 1])
            assert abs(float(r.acf) - expected) < 1e-9


def test_mannwhitney_matches_bruteforce(spark):
    """U statistic == direct pairwise count (with half-credit ties)."""
    ev = load(spark, SF_SMOKE, "events").filter("event_type = 'purchase'")
    obs = [(int(r.user_id) % 2, float(r.value)) for r in ev.collect()]
    a1 = sorted(v for arm, v in obs if arm == 1)
    a0 = sorted(v for arm, v in obs if arm == 0)
    # U1 = #(pairs where arm1 > arm0) + 0.5 * #(ties)
    u1 = 0.0
    for v1 in a1:
        for v0 in a0:
            if v1 > v0:
                u1 += 1.0
            elif v1 == v0:
                u1 += 0.5
    row = q_mannwhitney(spark, SF_SMOKE).collect()[0]
    assert row.n1 == len(a1) and row.n2 == len(a0)
    assert abs(float(row.u1) - u1) < 1e-6
    # z is standardized: |z| stays in a sane band for hash-assigned arms
    assert abs(float(row.z)) < 10


def test_sssp_is_valid_bfs(spark):
    """Distances are a fixpoint of the BFS recurrence on the projected
    graph: source at 0, every other reached node has a neighbor exactly
    one closer, and no edge spans more than one level."""
    rows = {int(r.custkey): int(r.dist) for r in q_graph_sssp(spark, SF_SMOKE).collect()}
    src = [c for c, d in rows.items() if d == 0]
    assert len(src) == 1
    assert all(0 <= d <= SSSP_MAX_HOPS for d in rows.values())
    # Rebuild the projection in Python (smoke scale) and check optimality.
    from sales_data_pipeline_gcp_spark.operators.components import KHOP_TOP_SUPPLIERS

    o = {int(r.o_orderkey): int(r.o_custkey) for r in load(spark, SF_SMOKE, "orders").collect()}
    import collections

    trade = collections.defaultdict(float)
    for r in load(spark, SF_SMOKE, "lineitem").collect():
        ok = int(r.l_orderkey)
        if ok in o:
            trade[(o[ok], int(r.l_suppkey))] += round(float(r.l_extendedprice) * 100)
    by_cust = collections.defaultdict(list)
    for (c, s), v in trade.items():
        by_cust[c].append((-v, s))
    edges = collections.defaultdict(set)
    cust_supps = {}
    for c, lst in by_cust.items():
        lst.sort()
        cust_supps[c] = {s for _, s in lst[:KHOP_TOP_SUPPLIERS]}
    by_supp = collections.defaultdict(set)
    for c, ss in cust_supps.items():
        for s in ss:
            by_supp[s].add(c)
    adj = collections.defaultdict(set)
    for s, cs in by_supp.items():
        for a in cs:
            for b in cs:
                if a != b:
                    adj[a].add(b)
    # Python BFS from min customer
    start = min(cust_supps)
    dist = {start: 0}
    frontier = [start]
    for d in range(1, SSSP_MAX_HOPS + 1):
        nxt = []
        for c in frontier:
            for nb in adj[c]:
                if nb not in dist:
                    dist[nb] = d
                    nxt.append(nb)
        frontier = nxt
    assert rows == dist


def test_funnel_steps_bruteforce(spark):
    from sales_data_pipeline_gcp_spark.operators.events_queries import q_funnel_steps

    ev = [
        (int(r.ts), r.event_type, int(r.user_id))
        for r in load(spark, SF_SMOKE, "events").select("ts", "event_type", "user_id").collect()
    ]
    by_user: dict[int, list[tuple[int, str]]] = {}
    for ts, et, uid in ev:
        by_user.setdefault(uid, []).append((ts, et))
    n = [0, 0, 0]
    s2 = s3 = 0
    for rows in by_user.values():
        v = min((ts for ts, et in rows if et == "view"), default=None)
        if v is None:
            continue
        n[0] += 1
        c = min((ts for ts, et in rows if et == "click" and ts >= v), default=None)
        if c is None:
            continue
        n[1] += 1
        s2 += (c - v) // 10**9
        p = min((ts for ts, et in rows if et == "purchase" and ts >= c), default=None)
        if p is None:
            continue
        n[2] += 1
        s3 += (p - v) // 10**9
    got = {r.step: r for r in q_funnel_steps(spark, SF_SMOKE).collect()}
    assert [got[i + 1].n_users for i in range(3)] == n
    assert got[1].n_users >= got[2].n_users >= got[3].n_users > 0
    assert abs(got[2].avg_secs_from_start - s2 / n[1]) < 1e-9
    assert abs(got[3].avg_secs_from_start - s3 / n[2]) < 1e-9
    assert abs(got[3].conv_from_start - n[2] / n[0]) < 1e-12


def test_xyz_analysis_bruteforce(spark):
    from sales_data_pipeline_gcp_spark.operators.analytics import (
        XYZ_X_CV2,
        XYZ_Y_CV2,
        q_xyz_analysis,
    )

    li = load(spark, SF_SMOKE, "lineitem").select("l_partkey", "l_shipdate", "l_quantity").collect()
    import datetime

    epoch = datetime.date(1970, 1, 1)
    weekly: dict[tuple[int, int], int] = {}
    for r in li:
        d = r.l_shipdate.date() if isinstance(r.l_shipdate, datetime.datetime) else r.l_shipdate
        wk = (d - epoch).days // 7
        weekly[(int(r.l_partkey), wk)] = weekly.get((int(r.l_partkey), wk), 0) + round(
            float(r.l_quantity)
        )
    per_part: dict[int, list[int]] = {}
    for (pk, _wk), q in weekly.items():
        per_part.setdefault(pk, []).append(q)
    exp = {"X": [0, 0], "Y": [0, 0], "Z": [0, 0]}
    for qs in per_part.values():
        if len(qs) < 2:
            continue
        n = len(qs)
        s = sum(qs)
        sxx = sum(q * q for q in qs)
        cv2 = ((sxx - s * s / n) / (n - 1)) / ((s / n) ** 2)
        cls = "X" if cv2 < XYZ_X_CV2 else ("Y" if cv2 < XYZ_Y_CV2 else "Z")
        exp[cls][0] += 1
        exp[cls][1] += s
    got = {r.xyz_class: r for r in q_xyz_analysis(spark, SF_SMOKE).collect()}
    total = sum(v[0] for v in exp.values())
    for cls, (np_, tq) in exp.items():
        if np_ == 0:
            assert cls not in got
            continue
        assert got[cls].n_parts == np_ and got[cls].total_qty == tq
        assert abs(got[cls].share_parts - np_ / total) < 1e-12


def test_price_index_base_month_is_100(spark):
    from sales_data_pipeline_gcp_spark.operators.analytics import q_price_index

    rows = sorted(q_price_index(spark, SF_SMOKE).collect(), key=lambda r: r.mon)
    # base month: every matched part's floor-cent term equals its own base
    # revenue exactly, so the index is exactly 100
    assert abs(rows[0].laspeyres_index - 100.0) < 1e-12
    assert all(r.n_parts > 0 for r in rows)
    # matched-sample counts can never exceed the base month's part count
    assert all(r.n_parts <= rows[0].n_parts for r in rows)


def test_chained_index_matches_sequential_python(spark):
    from sales_data_pipeline_gcp_spark.operators.sql_surface import q_sql_chained_index

    rows = sorted(q_sql_chained_index(spark, SF_SMOKE).collect(), key=lambda r: r.rn)
    monthly = {}
    for r in load(spark, SF_SMOKE, "orders").select("o_orderdate", "o_totalprice").collect():
        mon = r.o_orderdate.year * 12 + r.o_orderdate.month - 1
        monthly[mon] = monthly.get(mon, 0) + round(float(r.o_totalprice) * 100)
    from sales_data_pipeline_gcp_spark.operators.sql_surface import CHAIN_MONTHS

    mons = [m for m in sorted(monthly) if m > max(monthly) - CHAIN_MONTHS]
    assert [r.mon for r in rows] == mons
    idx = 100.0
    prev = None
    for r, mon in zip(rows, mons):
        g = 1.0 if prev is None else min(max(monthly[mon] / prev, 0.8), 1.25)
        idx = idx * g if prev is not None else 100.0
        assert abs(r.growth - g) < 1e-15
        assert abs(r.chained_index - idx) < 1e-9
        assert 0.8 - 1e-15 <= r.growth <= 1.25 + 1e-15
        prev = monthly[mon]


def test_peak_concurrency_matches_bruteforce(spark):
    from sales_data_pipeline_gcp_spark.operators.events_queries import (
        SESSION_GAP_SEC,
        q_peak_concurrency,
    )

    ev = load(spark, SF_SMOKE, "events").selectExpr("user_id", "ts div 1000000000 AS sec").collect()
    by_user: dict[int, list[int]] = {}
    for r in ev:
        by_user.setdefault(int(r.user_id), []).append(int(r.sec))
    sessions = []
    for secs in by_user.values():
        secs.sort()
        start = prev = secs[0]
        for s in secs[1:]:
            if s - prev > SESSION_GAP_SEC:
                sessions.append((start, prev))
                start = s
            prev = s
        sessions.append((start, prev))
    # sweep
    deltas = sorted(
        [(s, 1) for s, _ in sessions] + [(e + 1, -1) for _, e in sessions],
        key=lambda x: (x[0], x[1]),
    )
    cur = peak = 0
    first_peak = None
    for t, d in deltas:
        cur += d
        if cur > peak:
            peak, first_peak = cur, t
    row = q_peak_concurrency(spark, SF_SMOKE).collect()[0]
    assert row.n_sessions == len(sessions)
    assert row.peak_concurrency == peak
    assert row.first_peak_sec == first_peak
    total = sum(e - s for s, e in sessions)
    assert abs(row.avg_session_secs - total / len(sessions)) < 1e-9
    assert peak > 1  # the fixture must actually overlap across users


def test_item_cf_matches_bruteforce(spark):
    import collections
    import math

    from sales_data_pipeline_gcp_spark.operators.analytics import (
        CF_MIN_CO,
        CF_TOP_K,
        q_item_cf,
    )

    li = load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey").collect()
    baskets = collections.defaultdict(set)
    for r in li:
        baskets[int(r.l_orderkey)].add(int(r.l_partkey))
    support = collections.Counter()
    co = collections.Counter()
    for parts in baskets.values():
        for p in parts:
            support[p] += 1
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                co[(a, b)] += 1
    neigh = collections.defaultdict(list)
    for (a, b), c in co.items():
        if c < CF_MIN_CO:
            continue
        cos = c / (math.sqrt(support[a]) * math.sqrt(support[b]))
        neigh[a].append((-cos, b, c))
        neigh[b].append((-cos, a, c))
    expected = {}
    for item, lst in neigh.items():
        lst.sort()
        for rnk, (negcos, nb, c) in enumerate(lst[:CF_TOP_K], 1):
            expected[(item, nb)] = (c, -negcos, rnk)
    got = {
        (int(r.item), int(r.neighbor)): (int(r.co), r.cosine, int(r.rnk))
        for r in q_item_cf(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expected)
    for k, (c, cos, rnk) in expected.items():
        gc, gcos, grnk = got[k]
        assert gc == c and grnk == rnk and abs(gcos - cos) < 1e-12
