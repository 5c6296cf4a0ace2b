"""Spatial operators: grid-blocked 2-D containment join.

The reference pipeline routes records by a 1-D predicate (prefix/suffix
match in scripts/main.py:21-23); the generalized engine also needs the 2-D
analog every geo-enriched pipeline hits: "which points fall inside which
rectangles" (store catchment areas, geofences, map tiles). The naive form
is an all-pairs theta join — quadratic, and Spark can only execute it as a
BroadcastNestedLoopJoin or a cartesian. The scale shape is **grid
blocking** (the same candidates-then-verify pattern as the MinHash LSH
family, applied to geometry):

1. overlay a fixed grid of cell size G over the domain;
2. each point hashes to exactly ONE cell (integer div — narrow map);
3. each rectangle explodes to the cells it COVERS (bounded fan-out: with
   box width capped below G, at most 2x2 = 4 cells per box);
4. equi-join on the cell key, then verify exact containment with the
   BETWEEN predicate on the survivors only.

The equi-join gives Catalyst a hash-joinable key, so the plan is a
broadcast hash join (small box side) or a plain shuffle hash join at
scale — never a nested loop. Candidate count per point is the number of
boxes overlapping its cell, not the box count; with boxes bounded by G the
grid guarantees each point meets only boxes within one cell of it. This is
the public "spatial join via space partitioning" design (grid files /
quadtrees flattened to a fixed level); at 100 TB both sides partition by
cell and the join co-locates, with skewed cells (dense cities) handled by
the same AQE skew splitting as any equi-join.

Coordinates are derived deterministically from fixture keys with pure
integer congruences (Lehmer-style multipliers mod the domain size), so
both engines compute bit-identical geometry — no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.plans.registry import register

#: square domain [0, _DOMAIN) on both axes.
_DOMAIN = 100_000
#: grid cell size; box half-extent is capped at _CELL // 2 - 1 below so a
#: box spans at most 2 cells per axis (4 candidate cells total).
_CELL = 5_000
#: integer multipliers scattering fixture keys over the domain (classic
#: Lehmer/Park-Miller constants — used as mixers, not as RNG state).
_PX, _PY = 48271, 16807
_BX, _BY = 69621, 40692

#: half-extent = 500 + (suppkey % 7) * 250 in [500, 2000]: every box is
#: narrower than one 5000-unit cell, bounding the explode fan-out at 4.
_HALF_SQL = "500 + (s_suppkey % 7) * 250"

_GEOM_SQL = f"""
    pts AS (
        SELECT c_custkey,
               (c_custkey * {_PX}) % {_DOMAIN} AS x,
               (c_custkey * {_PY}) % {_DOMAIN} AS y
        FROM customer
    ),
    boxes AS (
        SELECT s_suppkey AS box_id,
               (s_suppkey * {_BX}) % {_DOMAIN} - ({_HALF_SQL}) AS x_lo,
               (s_suppkey * {_BX}) % {_DOMAIN} + ({_HALF_SQL}) AS x_hi,
               (s_suppkey * {_BY}) % {_DOMAIN} - ({_HALF_SQL}) AS y_lo,
               (s_suppkey * {_BY}) % {_DOMAIN} + ({_HALF_SQL}) AS y_hi
        FROM supplier
    )"""


@register(
    "q_spatial_join",
    oracle=f"""
    WITH {_GEOM_SQL.strip()}
    SELECT b.box_id,
           CAST(COUNT(*) AS BIGINT)        AS n_points,
           CAST(SUM(p.c_custkey) AS BIGINT) AS sum_custkey,
           CAST(MIN(p.c_custkey) AS BIGINT) AS min_custkey
    FROM boxes b JOIN pts p
      ON p.x BETWEEN b.x_lo AND b.x_hi
     AND p.y BETWEEN b.y_lo AND b.y_hi
    GROUP BY b.box_id
    ORDER BY b.box_id
    """,
    doc="Grid-blocked spatial containment join: customer points vs "
    "supplier rectangles on a 100k x 100k integer domain. Spark never "
    "evaluates the quadratic BETWEEN theta join: each point maps to one "
    f"grid cell (x div {_CELL}, y div {_CELL}), each box explodes to the "
    "<= 4 cells it can touch (half-extent < cell/2 by construction), and "
    "the containment check runs only on cell-equal candidate pairs — an "
    "equi-join Catalyst turns into a broadcast hash join here (the "
    "exploded box side is dim-sized) and a cell-partitioned shuffle join "
    "at scale, with AQE splitting dense-city cell skew. The DuckDB "
    "oracle runs the straightforward theta join, proving the blocked "
    "plan loses no pairs. Coordinates are integer congruences of the "
    "keys, bit-identical across engines.",
    tags=("spatial", "join"),
)
def q_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey")

    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * _PX) % _DOMAIN).alias("x"),
        ((F.col("c_custkey") * _PY) % _DOMAIN).alias("y"),
    ).select(
        "c_custkey",
        "x",
        "y",
        F.expr(f"x div {_CELL}").alias("cx"),
        F.expr(f"y div {_CELL}").alias("cy"),
    )

    half = F.expr(_HALF_SQL)
    boxes = supp.select(
        F.col("s_suppkey").alias("box_id"),
        ((F.col("s_suppkey") * _BX) % _DOMAIN - half).alias("x_lo"),
        ((F.col("s_suppkey") * _BX) % _DOMAIN + half).alias("x_hi"),
        ((F.col("s_suppkey") * _BY) % _DOMAIN - half).alias("y_lo"),
        ((F.col("s_suppkey") * _BY) % _DOMAIN + half).alias("y_hi"),
    )
    # Cells covered by each box, clamped to the domain: lo can be negative
    # and hi can exceed the domain near the edges, but points only exist in
    # [0, _DOMAIN), so clamping before the div never drops a matchable cell
    # (and keeps the sequence() fan-out at the guaranteed <= 2 per axis).
    covered = boxes.select(
        "box_id",
        "x_lo",
        "x_hi",
        "y_lo",
        "y_hi",
        F.explode(
            F.sequence(
                F.expr(f"greatest(x_lo, 0) div {_CELL}"),
                F.expr(f"least(x_hi, {_DOMAIN - 1}) div {_CELL}"),
            )
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.expr(f"greatest(y_lo, 0) div {_CELL}"),
                F.expr(f"least(y_hi, {_DOMAIN - 1}) div {_CELL}"),
            )
        ).alias("cy"),
    )

    matched = pts.join(F.broadcast(covered), on=["cx", "cy"], how="inner").filter(
        F.col("x").between(F.col("x_lo"), F.col("x_hi"))
        & F.col("y").between(F.col("y_lo"), F.col("y_hi"))
    )
    return (
        matched.groupBy("box_id")
        .agg(
            F.count("*").alias("n_points"),
            F.sum("c_custkey").alias("sum_custkey"),
            F.min("c_custkey").alias("min_custkey"),
        )
        .orderBy("box_id")
    )


# --- grid-blocked nearest neighbor ------------------------------------------

#: search radius for q_spatial_nearest; completeness of the 3x3-cell
#: neighborhood requires R <= _CELL.
_RADIUS = 2_500
#: argmin encoding base: winner = min(dist2 * _ENC + site_id). Valid while
#: site ids stay below _ENC (2^21 ~ 2M sites — far above any tested SF) and
#: dist2 <= 2*R^2 < 2^24, so the encoded value fits in 2^45 << BIGINT.
_ENC = 1 << 21

_NN_GEOM_SQL = f"""
    pts AS (
        SELECT c_custkey,
               (c_custkey * {_PX}) % {_DOMAIN} AS x,
               (c_custkey * {_PY}) % {_DOMAIN} AS y
        FROM customer
    ),
    sites AS (
        SELECT s_suppkey AS site_id,
               (s_suppkey * {_BX}) % {_DOMAIN} AS sx,
               (s_suppkey * {_BY}) % {_DOMAIN} AS sy
        FROM supplier
    )"""


@register(
    "q_spatial_nearest",
    oracle=f"""
    WITH {_NN_GEOM_SQL.strip()},
    cand AS (
        SELECT p.c_custkey,
               (p.x - s.sx) * (p.x - s.sx) + (p.y - s.sy) * (p.y - s.sy) AS dist2,
               s.site_id
        FROM pts p JOIN sites s
          ON (p.x - s.sx) * (p.x - s.sx) + (p.y - s.sy) * (p.y - s.sy)
             <= {_RADIUS * _RADIUS}
    )
    SELECT c_custkey,
           CAST(MIN(dist2 * {_ENC} + site_id) % {_ENC} AS BIGINT)  AS site_id,
           CAST(MIN(dist2 * {_ENC} + site_id) // {_ENC} AS BIGINT) AS dist2
    FROM cand
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
    doc="Grid-blocked nearest-neighbor join: each customer point finds its "
    f"closest supplier site within radius {_RADIUS} (squared Euclidean on "
    "the same integer geometry as q_spatial_join). Spark never scores the "
    "quadratic point-x-site space: each site replicates to its cell's 3x3 "
    f"neighborhood (cell size {_CELL} >= R guarantees every point within R "
    "of a site shares one of those 9 cells — the completeness argument), "
    "the equi-join on the cell key yields only local candidates, and the "
    "winner per point is a plain MIN of the order-embedding encoding "
    f"dist2*{_ENC}+site_id — an argmin as a partial-aggregable hash "
    "aggregate (map-side combine), cheaper and skew-safer than a "
    "row_number window, with the site-id tiebreak built into the "
    "encoding so both engines pick the same site at equal distance. The "
    "oracle is the naive radius theta join + the same argmin, proving "
    "the grid loses no candidate. At 100 TB both sides partition by "
    "cell; site replication is a fixed 9x on the dim side only.",
    tags=("spatial", "join"),
)
def q_spatial_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey")

    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * _PX) % _DOMAIN).alias("x"),
        ((F.col("c_custkey") * _PY) % _DOMAIN).alias("y"),
    ).select(
        "*",
        F.expr(f"x div {_CELL}").alias("cx"),
        F.expr(f"y div {_CELL}").alias("cy"),
    )

    sites = supp.select(
        F.col("s_suppkey").alias("site_id"),
        ((F.col("s_suppkey") * _BX) % _DOMAIN).alias("sx"),
        ((F.col("s_suppkey") * _BY) % _DOMAIN).alias("sy"),
    )
    # 3x3 neighborhood of the site's cell, clamped to the domain so the
    # replication factor never exceeds 9 and edge cells stay valid.
    n_cells = _DOMAIN // _CELL
    replicated = (
        sites.select(
            "site_id",
            "sx",
            "sy",
            F.explode(
                F.sequence(
                    F.expr(f"greatest(sx div {_CELL} - 1, 0)"),
                    F.expr(f"least(sx div {_CELL} + 1, {n_cells - 1})"),
                )
            ).alias("cx"),
        )
        .select(
            "*",
            F.explode(
                F.sequence(
                    F.expr(f"greatest(sy div {_CELL} - 1, 0)"),
                    F.expr(f"least(sy div {_CELL} + 1, {n_cells - 1})"),
                )
            ).alias("cy"),
        )
    )

    dist2 = (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")) + (
        F.col("y") - F.col("sy")
    ) * (F.col("y") - F.col("sy"))
    cand = (
        pts.join(F.broadcast(replicated), on=["cx", "cy"], how="inner")
        .select("c_custkey", dist2.alias("d2"), "site_id")
        .filter(F.col("d2") <= _RADIUS * _RADIUS)
    )
    enc = F.min(F.col("d2") * _ENC + F.col("site_id"))
    return (
        cand.groupBy("c_custkey")
        .agg(
            (enc % _ENC).alias("site_id"),
            F.expr(f"min(d2 * {_ENC} + site_id) div {_ENC}").alias("dist2"),
        )
        .orderBy("c_custkey")
    )
