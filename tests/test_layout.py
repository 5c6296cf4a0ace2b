"""Z-order layout: key correctness against a pure-Python bit interleave,
and the operational claim — a z-ordered parquet rewrite tightens per-file
min/max footers on BOTH dimensions vs the unordered layout."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.operators.layout import (
    write_zordered,
    zorder_key,
)
from pyspark.sql import functions as F


def _py_spread16(x: int) -> int:
    x &= 0xFFFF
    for mask, shift in ((0x00FF00FF, 8), (0x0F0F0F0F, 4), (0x33333333, 2), (0x55555555, 1)):
        x = (x | (x << shift)) & mask
    return x


def _py_zorder(a: int, b: int) -> int:
    return _py_spread16(a) | (_py_spread16(b) << 1)


def test_zorder_key_matches_python(spark):
    vals = [(0, 0), (1, 0), (0, 1), (65535, 65535), (1234, 4321), (255, 256)]
    df = spark.createDataFrame(vals, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for a, b in vals:
        assert got[(a, b)] == _py_zorder(a, b), (a, b)


def _avg_file_range(path: str, column: str) -> float:
    """Mean (max-min) of ``column`` across the parquet files at path."""
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    st = col.statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            spans.append(hi - lo)
    assert spans, f"no parquet stats found under {path}"
    return sum(spans) / len(spans)


def test_zordered_write_tightens_footers_on_both_dims(spark, sf_smoke_dir, tmp_path):
    li = load(spark, sf_smoke_dir, "lineitem").select("l_partkey", "l_suppkey")
    plain = str(tmp_path / "plain")
    li.repartition(16).write.parquet(plain)
    zpath = str(tmp_path / "zordered")
    write_zordered(li, ("l_partkey", "l_suppkey"), zpath, n_files=16)

    for col in ("l_partkey", "l_suppkey"):
        plain_span = _avg_file_range(plain, col)
        z_span = _avg_file_range(zpath, col)
        # a 16-region z-layout is a ~4x4 grid over the 2-D key space: each
        # file should cover a fraction of BOTH domains; random placement
        # covers nearly all of each. 0.6 leaves slack for skewed domains.
        assert z_span < 0.6 * plain_span, (col, z_span, plain_span)


def _files_overlapping(path: str, column: str, lo: int, hi: int) -> tuple[int, int]:
    """(n_files, n_files whose footer [min,max] overlaps [lo,hi])."""
    n, hit = 0, 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    st = col.statistics
                    fmin = st.min if fmin is None else min(fmin, st.min)
                    fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is None:
            continue
        n += 1
        if fmax >= lo and fmin <= hi:
            hit += 1
    assert n, f"no parquet stats under {path}"
    return n, hit


def test_zorder_pruning_payoff_simulated(spark, sf_dir):
    """The declared q_zorder_pruning query's own numbers must show the
    payoff: the z-layout scans fewer files than the single-column sort on
    the NON-sorted dimension, and strictly fewer than all files on both."""
    from sales_data_pipeline_gcp_spark.plans import registry

    rows = {
        r.layout: r
        for r in registry.all_queries()["q_zorder_pruning"].fn(spark, sf_dir).collect()
    }
    z, s = rows["zorder"], rows["single_sort"]
    assert z.n_files == s.n_files
    # single sort on partkey: near-perfect partkey pruning, ~no suppkey pruning
    assert s.files_scanned_supp > 0.8 * s.n_files
    # z-order: meaningful pruning on BOTH dimensions
    assert z.files_scanned_supp < 0.6 * s.files_scanned_supp
    assert z.files_scanned_part < 0.6 * z.n_files


def test_zordered_write_prunes_physical_footers(spark, sf_smoke_dir, tmp_path):
    """Physical counterpart of q_zorder_pruning: after a real parquet
    rewrite, a band predicate on the second dimension overlaps FEWER
    z-ordered files' footers than single-sorted files' footers — the
    row-group pruning a scan would actually get."""
    li = load(spark, sf_smoke_dir, "lineitem").select("l_partkey", "l_suppkey")
    single = str(tmp_path / "single")
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.parquet(single)
    )
    zpath = str(tmp_path / "z")
    write_zordered(li, ("l_partkey", "l_suppkey"), zpath, n_files=16)

    stats = li.agg(
        F.min("l_suppkey").alias("mn"), F.max("l_suppkey").alias("mx")
    ).collect()[0]
    lo = stats.mn + (stats.mx - stats.mn) * 2 // 5
    hi = stats.mn + (stats.mx - stats.mn) // 2
    n_s, hit_s = _files_overlapping(single, "l_suppkey", lo, hi)
    n_z, hit_z = _files_overlapping(zpath, "l_suppkey", lo, hi)
    assert hit_s > 0.8 * n_s, (hit_s, n_s)  # single sort can't prune dim 2
    assert hit_z < 0.7 * hit_s, (hit_z, hit_s)  # z-order can


def test_bloom_prefilter_never_false_negative(spark, sf_dir):
    """The property that makes a Bloom prefilter SAFE to apply before a
    join: every true member must survive the bitmap test (false positives
    cost extra work; a false negative silently drops rows)."""
    from sales_data_pipeline_gcp_spark.plans import registry

    row = registry.all_queries()["q_bloom_prefilter"].fn(spark, sf_dir).collect()[0]
    # all actual matches are candidates: candidates >= true and the
    # false-positive count accounts exactly for the difference
    assert row.n_candidates == row.n_true + row.n_false_pos
    assert row.n_true > 0  # fixture actually exercises membership
