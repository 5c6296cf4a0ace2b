"""Property-based check of the shingle/Jaccard pipeline against a pure-
Python reference on randomized corpora — catches boundary bugs (short
docs, identical docs, empty overlap) the fixtures may not contain."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sales_data_pipeline_gcp_spark.operators.dedup import (
    SHINGLE_WORDS,
    jaccard_pairs,
    shingles_from,
)

WORDS = ["aa", "bb", "cc", "dd", "ee"]


def _py_shingles(text: str) -> set[str]:
    ws = [w for w in text.split(" ") if w]
    if len(ws) < SHINGLE_WORDS:
        return set()
    return {" ".join(ws[i : i + SHINGLE_WORDS]) for i in range(len(ws) - SHINGLE_WORDS + 1)}


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(0, 2**31))
def test_jaccard_matches_python(spark, seed):
    rng = random.Random(seed)
    docs = []
    for i in range(rng.randint(2, 12)):
        n = rng.randint(0, 12)
        docs.append((i, " ".join(rng.choice(WORDS) for _ in range(n))))
    if rng.random() < 0.5 and docs:  # force an exact duplicate pair
        docs.append((len(docs), docs[0][1]))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(shingles_from(df)).collect()
    }

    sh = {i: _py_shingles(t) for i, t in docs}
    expected = {}
    ids = sorted(sh)
    for i in ids:
        for j in ids:
            if i < j and sh[i] and sh[j]:
                inter = len(sh[i] & sh[j])
                if inter:
                    expected[(i, j)] = inter / (len(sh[i]) + len(sh[j]) - inter)
    assert got == expected, (seed, got, expected)
