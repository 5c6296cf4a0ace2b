"""The reference pipeline's cleaning semantics, parameterized.

Re-expresses scripts/process_sales.py:38-63 (reference repo) as reusable
operators, preserving the fine print from SURVEY.md §2.2:

- the all-null-drop filter is two-valued (``isNull`` never yields NULL);
  a row with only SOME of the columns NULL survives;
- imputations are SEQUENTIAL: each rule sees the columns produced by the
  previous one (chained ``withColumn`` rebinding) — ``quantity`` is imputed
  from the ORIGINAL ``total``, then ``total`` from the IMPUTED ``quantity``;
- ``floor(total/price)`` is double division then floor -> bigint; the final
  projection narrows to int;
- ``round(price*quantity, 2)`` rounds the double HALF_UP;
- ``processed_at`` is ``current_timestamp()`` — per-query constant,
  non-deterministic across runs, so it is excluded from declared oracle
  queries.

All expressions are built-in Catalyst expressions — the whole pipeline stays
inside whole-stage codegen, fully narrow (zero shuffles), which is exactly
what makes it scale linearly to 100 TB: every input split cleans
independently.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (column, imputation expression) pairs applied sequentially.
ImputeRule = tuple[str, Column]


def drop_all_null_rows(df: DataFrame, cols: list[str]) -> DataFrame:
    """Drop rows where ALL of ``cols`` are NULL (reference
    scripts/process_sales.py:38-40). Narrow, no shuffle."""
    all_null = reduce(lambda a, b: a & b, [F.col(c).isNull() for c in cols])
    return df.filter(~all_null)


def impute_sequential(df: DataFrame, rules: list[ImputeRule]) -> DataFrame:
    """Apply NULL-imputation rules in order, each seeing prior results
    (reference scripts/process_sales.py:42-49 chained withColumn)."""
    for col, expr in rules:
        df = df.withColumn(col, F.when(F.col(col).isNull(), expr).otherwise(F.col(col)))
    return df


def sales_impute_rules() -> list[ImputeRule]:
    """The reference's two rules, in its order (process_sales.py:42-49).

    Deviation (documented, SURVEY.md §2.2.3): the reference ran Spark 3.3
    with ANSI off, where ``total/0.0`` yields Infinity and ``floor`` then
    overflows to garbage. Spark 4 runs ANSI by default and raises
    DIVIDE_BY_ZERO instead. We use ``try_divide`` — a zero/invalid divisor
    imputes NULL, which is strictly saner than the reference's overflow and
    identical everywhere the reference produces a defined value.
    """
    return [
        ("quantity", F.floor(F.try_divide(F.col("total"), F.col("price")))),
        ("total", F.round(F.col("price") * F.col("quantity"), 2)),
    ]


def clean_sales(df: DataFrame, *, audit: bool = True) -> DataFrame:
    """The full reference pipeline (scripts/process_sales.py:35-63):
    all-null drop -> sequential imputation -> audit column -> cast projection.

    ``audit=False`` omits the non-deterministic ``processed_at`` for
    oracle-comparable output. The float32/int32 narrowing casts reproduce the
    reference's projection (process_sales.py:55-63) including its lossy
    float32 round-trip quirk (SURVEY.md §1.2).
    """
    df = drop_all_null_rows(df, ["quantity", "price", "total"])
    df = impute_sequential(df, sales_impute_rules())
    cols = [
        F.col("product"),
        F.col("price").cast("float").alias("price"),
        F.col("quantity").cast("int").alias("quantity"),
        F.col("total").cast("float").alias("total"),
        F.col("ordered_at"),
        F.col("delivery_at"),
    ]
    if audit:
        df = df.withColumn("processed_at", F.current_timestamp())
        cols.append(F.col("processed_at"))
    return df.select(*cols)
