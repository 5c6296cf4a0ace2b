"""Declared queries for the reference's cleaning semantics
(SURVEY.md §2.1 rows 7-11, §7 Phase 1).

The driver's oracle runs only over the fixture tables, so these queries
first derive a ``sales_raw``-shaped relation from ``lineitem``
deterministically (same NULL pattern the reference simulator injects,
keyed on ``l_orderkey*10 + l_linenumber``), then apply the engine's
cleaning operators. Spark and DuckDB both compute the derivation from the
same parquet rows, so the comparison exercises exactly the cleaning
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.cleaning import (
    drop_all_null_rows,
    impute_sequential,
    sales_impute_rules,
)
from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.plans.registry import register

# NULL-injection pattern (mirrors sales_data_simulator.py:46-57, keyed on a
# deterministic row id instead of the generator loop index).
_SALES_SQL_CTE = """
WITH sales AS (
    SELECT
        l_returnflag AS product,
        CASE WHEN (l_orderkey * 10 + l_linenumber) % 5 = 0 THEN NULL
             ELSE l_extendedprice END                                   AS price,
        CASE WHEN (l_orderkey * 10 + l_linenumber) % 5 = 0
               OR (l_orderkey * 10 + l_linenumber) % 2 = 1 THEN NULL
             ELSE CAST(l_quantity AS INTEGER) END                       AS quantity,
        CASE WHEN (l_orderkey * 10 + l_linenumber) % 5 = 0
               OR (l_orderkey * 10 + l_linenumber) % 7 = 3 THEN NULL
             ELSE ROUND(l_extendedprice * l_quantity, 2) END            AS total,
        l_shipdate                                                      AS ordered_at,
        l_shipdate + INTERVAL (l_linenumber) DAY                        AS delivery_at,
        l_orderkey * 10 + l_linenumber                                  AS sale_id
    FROM lineitem
)
"""


def sales_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame twin of ``_SALES_SQL_CTE``."""
    li = load(spark, sf_dir, "lineitem")
    rid = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    all_null = (rid % 5) == 0
    qty_null = all_null | ((rid % 2) == 1)
    return li.select(
        F.col("l_returnflag").alias("product"),
        F.when(all_null, F.lit(None)).otherwise(F.col("l_extendedprice")).alias("price"),
        F.when(qty_null, F.lit(None)).otherwise(F.col("l_quantity").cast("int")).alias("quantity"),
        F.when(all_null | ((rid % 7) == 3), F.lit(None))
        .otherwise(F.round(F.col("l_extendedprice") * F.col("l_quantity"), 2))
        .alias("total"),
        F.col("l_shipdate").alias("ordered_at"),
        F.expr("l_shipdate + make_interval(0, 0, 0, l_linenumber, 0, 0, 0)").alias("delivery_at"),
        rid.alias("sale_id"),
    )


@register(
    "q_filter_nulls",
    oracle=_SALES_SQL_CTE
    + """
    SELECT sale_id, product, price, quantity, total
    FROM sales
    WHERE NOT (quantity IS NULL AND price IS NULL AND total IS NULL)
    """,
    doc="Reference op #7: drop rows where quantity, price AND total are all "
    "NULL (scripts/process_sales.py:38-40). Narrow filter, zero shuffles.",
    tags=("cleaning",),
)
def q_filter_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    sales = sales_from_lineitem(spark, sf_dir)
    return drop_all_null_rows(sales, ["quantity", "price", "total"]).select(
        "sale_id", "product", "price", "quantity", "total"
    )


@register(
    "q_case_impute",
    oracle=_SALES_SQL_CTE
    + """
    , kept AS (
        SELECT * FROM sales
        WHERE NOT (quantity IS NULL AND price IS NULL AND total IS NULL)
    ), q_imputed AS (
        SELECT sale_id, product, price, ordered_at, delivery_at, total,
               CASE WHEN quantity IS NULL THEN CAST(FLOOR(total / price) AS BIGINT)
                    ELSE CAST(quantity AS BIGINT) END AS quantity
        FROM kept
    )
    SELECT sale_id, product, price, quantity,
           CASE WHEN total IS NULL THEN ROUND(price * quantity, 2)
                ELSE total END AS total
    FROM q_imputed
    """,
    doc="Reference ops #8-9: sequential conditional imputation — quantity "
    "from the ORIGINAL total, then total from the IMPUTED quantity "
    "(scripts/process_sales.py:42-49 chained withColumn semantics).",
    tags=("cleaning",),
)
def q_case_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    sales = sales_from_lineitem(spark, sf_dir)
    kept = drop_all_null_rows(sales, ["quantity", "price", "total"])
    imputed = impute_sequential(kept, sales_impute_rules())
    return imputed.select("sale_id", "product", "price", "quantity", "total")


@register(
    "q_project_cast",
    oracle=_SALES_SQL_CTE
    + """
    SELECT sale_id,
           product,
           CAST(price AS REAL)     AS price,
           CAST(quantity AS INTEGER) AS quantity,
           CAST(total AS REAL)     AS total,
           ordered_at,
           delivery_at
    FROM sales
    """,
    doc="Reference op #11: fixed projection with narrowing casts — "
    "price/total -> float32, quantity -> int32, timestamps passthrough "
    "(scripts/process_sales.py:55-63, incl. the float32 quirk SURVEY §1.2).",
    tags=("cleaning",),
)
def q_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    sales = sales_from_lineitem(spark, sf_dir)
    return sales.select(
        "sale_id",
        "product",
        F.col("price").cast("float").alias("price"),
        F.col("quantity").cast("int").alias("quantity"),
        F.col("total").cast("float").alias("total"),
        "ordered_at",
        "delivery_at",
    )
