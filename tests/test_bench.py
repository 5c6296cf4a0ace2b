"""bench.py --merge regression cover (round-8 VERDICT item: the
supplement-first argument-order bug class was fixed in round 8 by
filtering `sweeps = [r for r in records if r.get("queries")]`; this pins
it so a refactor can't silently reintroduce base-record metadata being
read from an isolated-only supplement)."""

from __future__ import annotations

import importlib.util
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", os.path.join(HERE, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_merge_supplement_first(tmp_path, capsys):
    """An isolated-only supplement listed BEFORE the sweep must not become
    the base record: sf/runs_per_query/isolated_note come from the sweep,
    n_sweeps counts sweeps only, and the supplement's cleaner isolated
    reading still wins for a promoted cost leader."""
    bench = _load_bench()
    supplement = {
        # no "queries" column: isolated-only supplement record
        "isolated": {"q_slow": 1.0},
        "window": "20260815T000000Z-supplement",
        "value": None,
    }
    sweep = {
        "queries": {"q_slow": 5.0, "q_fast": 0.2},
        "isolated": {"q_slow": 4.0},
        "isolated_note": "base-note",
        "sf": 0.1,
        "runs_per_query": 3,
        "n_shards": 4,
        "window": "20260815T010000Z",
        "value": 5.2,
    }
    p_sup = tmp_path / "sup.json"
    p_swp = tmp_path / "swp.json"
    p_sup.write_text(json.dumps(supplement))
    p_swp.write_text(json.dumps(sweep))

    bench.merge([str(p_sup), str(p_swp)], out_dir=str(tmp_path))

    merged = json.loads((tmp_path / "BENCH_FULL.json").read_text())
    assert merged["n_sweeps"] == 1, "supplement must not count as a sweep"
    assert merged["sf"] == 0.1 and merged["runs_per_query"] == 3
    assert merged["isolated_note"].startswith("base-note")
    assert merged["queries"] == {"q_slow": 5.0, "q_fast": 0.2}
    # the supplement's cleaner isolated reading wins and is provenance-tagged
    assert merged["isolated"]["q_slow"] == 1.0
    assert merged["isolated_window"]["q_slow"].endswith("/supplement")
    kinds = {m["kind"] for m in merged["provenance"]["merged_from"]}
    assert kinds == {"sweep", "isolated-supplement"}

    line = capsys.readouterr().out.strip().splitlines()[-1]
    official = json.loads(line)
    # the merge path is the only writer of BENCH_FULL.json, so only it may
    # point full_record there (round-8 ADVICE: plain sweeps now point at
    # their own dated raw record instead)
    assert official["full_record"] == "BENCH_FULL.json"
    assert official["n_sweeps"] == 1


def test_merge_requires_a_sweep(tmp_path):
    bench = _load_bench()
    p = tmp_path / "sup.json"
    p.write_text(json.dumps({"isolated": {"q_x": 1.0}}))
    import pytest

    with pytest.raises(SystemExit):
        bench.merge([str(p)], out_dir=str(tmp_path))
