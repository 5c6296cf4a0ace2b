"""Reusable relational operator helpers.

All helpers are deterministic-by-construction: anything that picks "one row
among ties" (top-k, dedup) takes an explicit total ordering, because at
cluster scale `dropDuplicates`/`limit` tie-breaking is partition-order
dependent and non-reproducible across runs (SURVEY.md §7 hard-part #2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k. ``orderBy().limit()`` compiles to
    ``TakeOrderedAndProject`` — each partition keeps a k-row heap and only
    k rows per partition reach the driver-side merge, so this scales to any
    input size as long as k is small."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame, partition_by: list[str], order_by: list[Column], k: int, *, rank_col: str = "rn"
) -> DataFrame:
    """Top-k per group via row_number over a total order: one shuffle on the
    partition keys; AQE splits skewed groups' sort spills."""
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def dedup_by_key(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """Exact key-dedup keeping the FIRST row under ``order_by`` — the
    deterministic form of ``dropDuplicates(keys)`` (which keeps an arbitrary
    row, non-reproducible under retries/partition order at scale)."""
    w = W.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
