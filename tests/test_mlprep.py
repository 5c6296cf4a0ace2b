"""Independent property checks for the ML-data-prep operators (mlprep.py) —
brute-force Python recomputations and leakage invariants at smoke scale,
NOT the DuckDB oracle (tests/test_parity.py already runs that)."""

from __future__ import annotations

import numpy as np

from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.operators.mlprep import (
    EMBARGO_BP,
    LABEL_HORIZON_DAYS,
    MEDIAN_WINDOW,
    SPLIT_TRAIN_BP,
    SPLIT_VALID_BP,
    q_label_window,
    q_train_test_split,
    q_tv_drift,
    q_window_median,
)

from tests.conftest import SF_SMOKE

_NS_PER_DAY = 86400 * 10**9


def _events(spark):
    return [
        (int(r.event_id), int(r.ts), int(r.user_id), r.event_type)
        for r in load(spark, SF_SMOKE, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .collect()
    ]


def test_label_window_matches_bruteforce(spark):
    ev = _events(spark)
    by_user: dict[int, list[tuple[int, int, str]]] = {}
    for eid, ts, uid, et in ev:
        by_user.setdefault(uid, []).append((ts, eid, et))
    expected: dict[int, list[int]] = {}
    for uid, rows in by_user.items():
        rows.sort()
        for i, (ts, _eid, et) in enumerate(rows):
            if et != "view":
                continue
            label = int(
                any(
                    et2 == "purchase" and ts2 - ts <= LABEL_HORIZON_DAYS * _NS_PER_DAY
                    for (ts2, _e2, et2) in rows[i + 1 :]
                )
            )
            expected.setdefault(ts // _NS_PER_DAY, []).append(label)
    got = {int(r.day): r for r in q_label_window(spark, SF_SMOKE).collect()}
    assert set(got) == set(expected)
    for day, labels in expected.items():
        r = got[day]
        assert r.n_views == len(labels)
        assert r.n_pos == sum(labels)
        assert abs(r.pos_rate - sum(labels) / len(labels)) < 1e-12
    # fixture must exercise both classes somewhere
    assert any(r.n_pos > 0 for r in got.values())
    assert any(r.n_pos < r.n_views for r in got.values())


def test_train_test_split_leakage_gap_and_totals(spark):
    rows = {r.split: r for r in q_train_test_split(spark, SF_SMOKE).collect()}
    ev = _events(spark)
    assert sum(r.n_events for r in rows.values()) == len(ev)
    tmin = min(ts for _, ts, _, _ in ev)
    tmax = max(ts for _, ts, _, _ in ev)
    unit = (tmax - tmin) // 10000
    t1 = tmin + SPLIT_TRAIN_BP * unit
    t2 = tmin + SPLIT_VALID_BP * unit
    e = EMBARGO_BP * unit

    def tag(ts: int) -> str:
        if ts < t1 - e:
            return "train"
        if ts < t1:
            return "purged"
        if ts < t2 - e:
            return "valid"
        if ts < t2:
            return "purged"
        return "test"

    exp_counts: dict[str, int] = {}
    for _, ts, _, _ in ev:
        exp_counts[tag(ts)] = exp_counts.get(tag(ts), 0) + 1
    assert {k: r.n_events for k, r in rows.items()} == exp_counts
    # temporal ordering with a real gap: each split's day range precedes the
    # next, and the embargo keeps train and valid from touching
    assert rows["train"].max_day <= rows["valid"].min_day
    assert rows["valid"].max_day <= rows["test"].min_day
    assert "purged" in rows and rows["purged"].n_events > 0


def test_tv_drift_matches_bruteforce(spark):
    row = q_tv_drift(spark, SF_SMOKE).collect()[0]
    ev = _events(spark)
    tmin = min(ts for _, ts, _, _ in ev)
    tmax = max(ts for _, ts, _, _ in ev)
    mid = tmin + (tmax - tmin) // 2
    types = sorted({et for *_, et in ev})
    ca = {t: 0 for t in types}
    cb = {t: 0 for t in types}
    for _, ts, _, et in ev:
        (ca if ts < mid else cb)[et] += 1
    na, nb = sum(ca.values()), sum(cb.values())
    tv = sum(abs(ca[t] / na - cb[t] / nb) for t in types) / 2
    assert row.n_before == na and row.n_after == nb
    assert abs(row.tv_stat - tv) < 1e-12
    assert 0.0 <= row.tv_stat <= 1.0
    top = max(types, key=lambda t: (abs(ca[t] * nb - cb[t] * na), [-ord(c) for c in t]))
    assert row.top_type == top


def test_window_median_matches_bruteforce(spark):
    daily = sorted(
        (r.d, round(float(r.s) * 100))
        for r in load(spark, SF_SMOKE, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .withColumnRenamed("sum(o_totalprice)", "s")
        .withColumnRenamed("o_orderdate", "d")
        .collect()
    )
    rows = sorted(q_window_median(spark, SF_SMOKE).collect(), key=lambda r: r.d)
    assert len(rows) == len(daily) - (MEDIAN_WINDOW - 1)
    revs = [c for _, c in daily]
    for i, r in enumerate(rows):
        frame = sorted(revs[i : i + MEDIAN_WINDOW])
        assert round(r.median7 * 100) == frame[MEDIAN_WINDOW // 2]
        assert round(r.revenue * 100) == revs[i + MEDIAN_WINDOW - 1]


def test_feature_hash_matches_bruteforce(spark):
    import hashlib

    from sales_data_pipeline_gcp_spark.operators.mlprep import (
        FEATURE_BUCKETS,
        PROP_MOD,
        q_feature_hash,
    )

    def bucket(tok: str) -> int:
        h = int(hashlib.md5(("fh:" + tok).encode()).hexdigest()[:15], 16)
        return h % FEATURE_BUCKETS

    import json

    rows = load(spark, SF_SMOKE, "events").select("user_id", "event_type", "props").collect()
    expected: dict[int, list[int]] = {}
    for r in rows:
        toks = ["t:" + r.event_type]
        k = json.loads(r.props).get("k") if r.props else None
        if k is not None:
            toks.append(f"k:{int(k) % PROP_MOD}")
        vec = expected.setdefault(int(r.user_id), [0] * (FEATURE_BUCKETS + 1))
        for t in toks:
            vec[0] += 1
            vec[1 + bucket(t)] += 1
    got = {int(r.user_id): r for r in q_feature_hash(spark, SF_SMOKE).collect()}
    assert set(got) == set(expected)
    for uid, vec in expected.items():
        r = got[uid]
        assert r.n_tokens == vec[0]
        for i in range(FEATURE_BUCKETS):
            assert getattr(r, f"f{i}") == vec[1 + i], (uid, i)


def test_lift_curve_invariants(spark):
    from sales_data_pipeline_gcp_spark.operators.mlprep import LIFT_TILES, q_lift_curve

    rows = sorted(q_lift_curve(spark, SF_SMOKE).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, LIFT_TILES + 1))
    n_users = sum(r.n_users for r in rows)
    # NTILE balance
    assert max(r.n_users for r in rows) - min(r.n_users for r in rows) <= 1
    total_pos = sum(r.n_pos for r in rows)
    base = total_pos / n_users
    cum = 0
    for r in rows:
        cum += r.n_pos
        assert abs(r.pos_rate - r.n_pos / r.n_users) < 1e-12
        assert abs(r.lift - (r.n_pos / r.n_users) / base) < 1e-12
        assert abs(r.cum_capture - cum / total_pos) < 1e-12
    assert abs(rows[-1].cum_capture - 1.0) < 1e-12


def test_window_hampel_matches_bruteforce(spark):
    from sales_data_pipeline_gcp_spark.operators.mlprep import HAMPEL_K, q_window_hampel

    daily = sorted(
        (r.d, round(float(r.s) * 100))
        for r in load(spark, SF_SMOKE, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .withColumnRenamed("sum(o_totalprice)", "s")
        .withColumnRenamed("o_orderdate", "d")
        .collect()
    )
    revs = [c for _, c in daily]
    rows = sorted(q_window_hampel(spark, SF_SMOKE).collect(), key=lambda r: r.d)
    assert len(rows) == len(daily) - (MEDIAN_WINDOW - 1)
    for i, r in enumerate(rows):
        frame = revs[i : i + MEDIAN_WINDOW]
        med = sorted(frame)[MEDIAN_WINDOW // 2]
        mad = sorted(abs(v - med) for v in frame)[MEDIAN_WINDOW // 2]
        assert round(r.med7 * 100) == med
        assert round(r.mad7 * 100) == mad
        cur = frame[-1]
        assert r.hampel_outlier == int(abs(cur - med) > HAMPEL_K * mad)
