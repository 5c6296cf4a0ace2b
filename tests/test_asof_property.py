"""Property-based check of the as-of join composition against a naive
per-row reference implementation on randomized small inputs — guards the
union+window trick against edge cases the fixture data may not contain
(empty right side per key, equal timestamps, all-late rows)."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sales_data_pipeline_gcp_spark.operators.asof import asof_join


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(0, 2**31))
def test_asof_matches_naive(spark, seed):
    rng = random.Random(seed)
    keys = [1, 2, 3]
    left = [
        (rng.choice(keys), rng.randint(0, 50), i) for i in range(rng.randint(1, 25))
    ]
    right = []
    used = set()
    for j in range(rng.randint(0, 25)):
        k, t = rng.choice(keys), rng.randint(0, 50)
        if (k, t) not in used:  # asof requires right unique per (key, time)
            used.add((k, t))
            right.append((k, t, 1000 + j))

    ldf = spark.createDataFrame(left, "k long, lt long, lid long")
    rdf = spark.createDataFrame(right, "k long, rt long, rid long")
    for direction in ("backward", "forward"):
        got = {
            r.lid: r.rid
            for r in asof_join(
                ldf, rdf, on="k", left_time="lt", right_time="rt",
                right_cols=["rid"], direction=direction,
            ).collect()
        }

        for k, lt, lid in left:
            if direction == "backward":
                cands = [(t, rid) for (rk, t, rid) in right if rk == k and t <= lt]
                expected = max(cands)[1] if cands else None
            else:
                cands = [(t, rid) for (rk, t, rid) in right if rk == k and t >= lt]
                expected = min(cands)[1] if cands else None
            assert got[lid] == expected, (seed, direction, lid, got[lid], expected)
