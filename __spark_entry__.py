"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``sales_data_pipeline_gcp_spark.plans.registry`` — the
single source of truth for declared queries and their DuckDB oracles. The
driver runs ``entry(spark)`` as a smoke check, then each ``queries()[name]``
at sf=0.01 against ``oracle_sql()[name]``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sales_data_pipeline_gcp_spark.plans import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return registry.queries()["q_agg_group"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every SQL-expressible query."""
    return registry.oracle_sql()
