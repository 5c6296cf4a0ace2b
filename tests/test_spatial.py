"""Properties of the grid-blocked spatial join and the compaction planner
beyond what the DuckDB oracle (which IS the brute-force theta join) pins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.operators import spatial
from sales_data_pipeline_gcp_spark.operators.layout import (
    _COMPACT_TARGET,
    q_compaction_plan,
)
from sales_data_pipeline_gcp_spark.operators.spatial import q_spatial_join


def test_spatial_blocking_no_dup_pairs(spark, sf_dir):
    """A point maps to exactly one grid cell, so the candidate join can
    never produce the same (box, point) pair twice — the dedup-free
    property the design relies on (an R-tree or multi-cell point scheme
    would need a distinct)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey")
    n_pairs = (
        q_spatial_join(spark, sf_dir).agg(F.sum("n_points")).collect()[0][0]
    )
    # recompute pairs with an explicit distinct on (box_id, c_custkey):
    # identical count <=> no duplicates existed pre-aggregation
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * spatial._PX) % spatial._DOMAIN).alias("x"),
        ((F.col("c_custkey") * spatial._PY) % spatial._DOMAIN).alias("y"),
    )
    half = F.expr(spatial._HALF_SQL)
    boxes = supp.select(
        F.col("s_suppkey").alias("box_id"),
        ((F.col("s_suppkey") * spatial._BX) % spatial._DOMAIN - half).alias("x_lo"),
        ((F.col("s_suppkey") * spatial._BX) % spatial._DOMAIN + half).alias("x_hi"),
        ((F.col("s_suppkey") * spatial._BY) % spatial._DOMAIN - half).alias("y_lo"),
        ((F.col("s_suppkey") * spatial._BY) % spatial._DOMAIN + half).alias("y_hi"),
    )
    exact = (
        pts.join(F.broadcast(boxes))
        .filter(
            F.col("x").between(F.col("x_lo"), F.col("x_hi"))
            & F.col("y").between(F.col("y_lo"), F.col("y_hi"))
        )
        .select("box_id", "c_custkey")
        .distinct()
        .count()
    )
    assert n_pairs == exact


def test_spatial_box_fanout_bounded(spark, sf_dir):
    """Every box covers at most 2x2 grid cells (half-extent < cell/2 by
    construction), including boxes clamped at the domain edge — the bound
    that keeps the exploded candidate side dim-sized."""
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey")
    half = F.expr(spatial._HALF_SQL)
    g = spatial._CELL
    d = spatial._DOMAIN
    fanout = (
        supp.select(
            ((F.col("s_suppkey") * spatial._BX) % d - half).alias("x_lo"),
            ((F.col("s_suppkey") * spatial._BX) % d + half).alias("x_hi"),
            ((F.col("s_suppkey") * spatial._BY) % d - half).alias("y_lo"),
            ((F.col("s_suppkey") * spatial._BY) % d + half).alias("y_hi"),
        )
        .select(
            (
                (
                    F.expr(f"least(x_hi, {d - 1}) div {g}")
                    - F.expr(f"greatest(x_lo, 0) div {g}")
                    + 1
                )
                * (
                    F.expr(f"least(y_hi, {d - 1}) div {g}")
                    - F.expr(f"greatest(y_lo, 0) div {g}")
                    + 1
                )
            ).alias("cells")
        )
        .agg(F.max("cells"))
        .collect()[0][0]
    )
    assert fanout <= 4


def test_compaction_plan_partitions_inventory(spark, sf_dir):
    """The plan is a partition of the file inventory: per-partition file
    counts and row totals are conserved, and each bin's span is
    contiguous (bins never interleave file_ids)."""
    plan = q_compaction_plan(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    totals = {
        r["part"]: (r["files"], r["rows"])
        for r in orders.groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("part")
        )
        .agg(
            F.countDistinct(F.col("o_orderkey") % 64).alias("files"),
            F.count("*").alias("rows"),
        )
        .collect()
    }
    by_part: dict = {}
    for r in plan:
        by_part.setdefault(r["part"], []).append(r)
    assert set(by_part) == set(totals)
    for part, rows in by_part.items():
        rows.sort(key=lambda r: r["bin"])
        assert sum(r["n_files"] for r in rows) == totals[part][0]
        assert sum(r["bin_rows"] for r in rows) == totals[part][1]
        for a, b in zip(rows, rows[1:]):
            assert a["last_file"] < b["first_file"]


def test_compaction_bins_minimal_overshoot(spark, sf_dir):
    """Cumsum-div packing never creates a bin that would still be a bin
    without its last file: bin_rows minus its final file's size is below
    the target (the standard at-most-one-file overshoot of contiguous
    compaction)."""
    files = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("part"),
            (F.col("o_orderkey") % 64).alias("file_id"),
        )
        .agg(F.count("*").alias("size_rows"))
    )
    plan = q_compaction_plan(spark, sf_dir)
    joined = plan.join(
        files.select(
            "part", F.col("file_id").alias("last_file"), F.col("size_rows").alias("last_size")
        ),
        on=["part", "last_file"],
    )
    bad = joined.filter(
        F.col("bin_rows") - F.col("last_size") >= F.lit(_COMPACT_TARGET)
    ).count()
    assert bad == 0
