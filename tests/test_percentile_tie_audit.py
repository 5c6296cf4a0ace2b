"""Declared-query exposure audit for the percentile tie-bracket boundary
(found by round-10 differential fuzzing — tests/test_differential_fuzz.py
section 20): Spark ``percentile()`` returns the element EXACTLY when the
interpolation bracket falls inside a run of equal values (counts-map
shortcut), while DuckDB 1.0.0 ``quantile_cont()`` evaluates the convex
form ``v*(1-f) + v*f`` unconditionally, which drifts one ulp on ~5.7% of
(v, f) pairs. On a DISTINCT bracket both engines compute the identical
convex form (fuzz-pinned), so the ONLY divergence condition is:

    bracket values equal  AND  v*(1-f) + v*f != v

This audit enumerates every declared percentile<->quantile_cont pairing
(exactly two: q_percentile and q_outlier_mad — q_window_median pairs
integer order statistics with QUANTILE_DISC, and q_agg_approx_bounds uses
percentile() Spark-side only) and proves NO (group, p) cut point at the
adjudication SF (sf0.01) or the per-round-gate SF (sf0.1) satisfies it —
i.e. the committed greens are structural for these fixtures, not luck.
A future fixture that trips this audit needs the tie-robust oracle
spelling (rank the sorted values in SQL and apply Spark's tie shortcut
explicitly) before it can ship — the audit failing IS that signal, the
same pattern as the round-9 CAST domain audit in functions/exact.py.

Scale nuance (measured one-off at sf10, round 10): at 60M lineitem rows
8 of q_percentile's 9 cut points DO land inside tie runs — the tie half
of the condition is routine at scale — but the convex form stays exact
there because the 10x-replica fixtures produce group sizes where
p*(n-1) yields a DYADIC fraction (f in {0.25, 0.5, 0.75}), and
v*(1-f) + v*f is exact for dyadic f. A production corpus with arbitrary
group sizes gets arbitrary f, so the tie-robust oracle spelling is the
right migration whenever a percentile query graduates to data without
this fixture structure.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIRS = [
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
# the derived sf1 fixture is machine-local (scale_fixtures.py output) —
# audit it too when present, skip cleanly when not
_SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1")
if os.path.isdir(_SF1):
    SF_DIRS.append(_SF1)


def _pq(sf_dir: str, table: str) -> str:
    """DuckDB-readable path for a table: the shipped fixtures are single
    files, the derived .scale ones are Spark part-file directories."""
    path = f"{sf_dir}/{table}.parquet"
    return f"{path}/*.parquet" if os.path.isdir(path) else path


def _exposed(sorted_vals: list[float], p: float) -> bool:
    """True iff the cut for probability p lands inside a tie run whose
    convex interpolation is INEXACT — the one cross-engine divergence
    condition (see module docstring)."""
    n = len(sorted_vals)
    if n == 0:
        return False
    h = p * (n - 1)
    lo, hi = math.floor(h), math.ceil(h)
    a, b = sorted_vals[lo], sorted_vals[hi]
    f = h - lo
    return a == b and a * (1 - f) + b * f != a


def _groups(con, sql: str) -> dict[str, list[float]]:
    out: dict[str, list[float]] = {}
    for key, val in con.execute(sql).fetchall():
        out.setdefault(key, []).append(val)
    for vals in out.values():
        vals.sort()
    return out


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_q_percentile_sites_not_exposed(sf_dir):
    con = duckdb.connect()
    try:
        groups = _groups(
            con,
            f"SELECT l_returnflag, l_extendedprice FROM '{_pq(sf_dir, 'lineitem')}' "
            "WHERE l_extendedprice IS NOT NULL",
        )
    finally:
        con.close()
    hits = [
        (g, p)
        for g, vals in groups.items()
        for p in (0.25, 0.5, 0.75)
        if _exposed(vals, p)
    ]
    assert not hits, (
        f"q_percentile cut points inside inexact tie runs at {sf_dir}: {hits} "
        "— the percentile()/quantile_cont() pairing diverges here; migrate "
        "the oracle to the tie-robust rank spelling (see module docstring)"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_q_outlier_mad_sites_not_exposed(sf_dir):
    con = duckdb.connect()
    try:
        groups = _groups(
            con,
            f"SELECT event_type, value FROM '{_pq(sf_dir, 'events')}' "
            "WHERE value IS NOT NULL",
        )
        # stage 1: the per-type median cut itself
        hits = [(g, 0.5) for g, vals in groups.items() if _exposed(vals, 0.5)]
        assert not hits, f"q_outlier_mad stage-1 median exposed at {sf_dir}: {hits}"
        # stage 2: the MAD cut over absdev = |value - median| (computed with
        # the shared convex form — stage 1 just proved both engines agree on
        # these groups, so the stage-2 input is engine-identical)
        for g, vals in groups.items():
            n = len(vals)
            h = 0.5 * (n - 1)
            lo, hi = math.floor(h), math.ceil(h)
            f = h - lo
            med = vals[lo] * (1 - f) + vals[hi] * f
            absdev = sorted(abs(v - med) for v in vals)
            assert not _exposed(absdev, 0.5), (
                f"q_outlier_mad stage-2 MAD cut exposed at {sf_dir}, group {g}"
            )
    finally:
        con.close()
