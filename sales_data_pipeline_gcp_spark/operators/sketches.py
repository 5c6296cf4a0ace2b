"""Distributed Count-Min Sketch — the "novel sketch" operator class.

A CMS summarizes a frequency distribution in O(depth x width) space with
one-sided error: ``estimate >= true`` always, and
``estimate <= true + eps*N`` with probability 1-delta (eps = e/width,
delta = e^-depth). On Spark the BUILD is a single groupBy over
(row, column) cells — each token occurrence increments cell
(i, h_i(token) mod width) for each of the ``depth`` seeded hashes — so the
sketch of a 100 TB stream is one partial-aggregated shuffle of at most
depth*width rows. Frequency queries join the (tiny, broadcastable) sketch
and take the min across rows.

The seeded hashes come from the shared md5 family, so the whole pipeline —
build AND query — is bit-reproducible in the DuckDB oracle, and the
declared query verifies the one-sided error law itself (est >= exact for
every probed token).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.functions.hashing import shared_hash, sql_shared_hash
from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.plans.registry import register

DEPTH = 4
WIDTH = 64


def cms_build(items: DataFrame, col: str, depth: int = DEPTH, width: int = WIDTH) -> DataFrame:
    """(row, col, cnt) cells of the sketch; at most depth*width rows."""
    cells = None
    for i in range(depth):
        cell = items.select(
            F.lit(i).alias("row"),
            (shared_hash(F.col(col), f"cms{i}:") % width).alias("cell"),
        )
        cells = cell if cells is None else cells.unionByName(cell)
    return cells.groupBy("row", "cell").agg(F.count("*").alias("cnt"))


def cms_estimate(sketch: DataFrame, keys: DataFrame, col: str, depth: int = DEPTH, width: int = WIDTH) -> DataFrame:
    """Point-frequency estimates: min over rows of the key's cells."""
    probes = None
    for i in range(depth):
        p = keys.select(
            F.col(col),
            F.lit(i).alias("row"),
            (shared_hash(F.col(col), f"cms{i}:") % width).alias("cell"),
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        probes.join(F.broadcast(sketch), ["row", "cell"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )


def _sql_cells(i: int) -> str:
    return f"SELECT {i} AS row, {sql_shared_hash('token', f'cms{i}:')} % {WIDTH} AS cell FROM tokens"


@register(
    "q_sketch_cms",
    oracle=f"""
    WITH tokens AS (
        SELECT UNNEST(list_filter(string_split(text, ' '), w -> w <> '')) AS token
        FROM documents
    ), cells AS (
        {" UNION ALL ".join(_sql_cells(i) for i in range(DEPTH))}
    ), sketch AS (
        SELECT row, cell, COUNT(*) AS cnt FROM cells GROUP BY row, cell
    ), exact AS (
        SELECT token, COUNT(*) AS exact_count FROM tokens GROUP BY token
    ), probes AS (
        {" UNION ALL ".join(
            f"SELECT token, {i} AS row, {sql_shared_hash('token', f'cms{i}:')} % {WIDTH} AS cell FROM exact"
            for i in range(DEPTH)
        )}
    ), est AS (
        SELECT p.token, MIN(COALESCE(s.cnt, 0)) AS cms_estimate
        FROM probes p LEFT JOIN sketch s ON p.row = s.row AND p.cell = s.cell
        GROUP BY p.token
    )
    SELECT e.token, x.exact_count, e.cms_estimate,
           e.cms_estimate >= x.exact_count AS one_sided_ok
    FROM est e JOIN exact x ON e.token = x.token
    """,
    doc=f"Count-Min Sketch ({DEPTH}x{WIDTH}): distributed build (one "
    "groupBy over hash cells), broadcast point queries, and the one-sided "
    "error law (estimate >= exact for every token) emitted as a verified "
    "column. Bit-reproducible in the oracle via the shared hash family.",
    tags=("sketch", "text"),
)
def q_sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tokens = d.select(
        F.explode(F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))).alias("token")
    )
    sketch = cms_build(tokens, "token")
    exact = tokens.groupBy("token").agg(F.count("*").alias("exact_count"))
    est = cms_estimate(sketch, exact.select("token"), "token")
    return (
        est.join(exact, "token")
        .select(
            "token",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") >= F.col("exact_count")).alias("one_sided_ok"),
        )
    )
