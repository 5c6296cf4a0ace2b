"""Declared-query registry.

Every operator the engine claims (SURVEY.md §2) registers here as a
``(name, spark_fn, oracle_sql)`` triple. The driver contract
(``__spark_entry__.py``) and the local parity tests both iterate this
registry, so a query can never be declared without its oracle staying in
sync.

Oracle-exactness rules baked into how queries must be written
(SURVEY.md §2.2 / §7 "hard parts"):

- alias every computed column identically in Spark and SQL;
- double-typed aggregates go through an exact decimal accumulation then a
  final cast to DOUBLE, so Spark and DuckDB produce bit-identical floats
  regardless of partial-aggregation order;
- never emit ``current_timestamp()`` or other non-determinism;
- break top-k ties deterministically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, *, doc: str = "", tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as declared query ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    import importlib

    for mod in (
        "sales_data_pipeline_gcp_spark.operators.relational",
        "sales_data_pipeline_gcp_spark.operators.scalars",
        "sales_data_pipeline_gcp_spark.operators.cleaning_queries",
        "sales_data_pipeline_gcp_spark.operators.dedup",
        "sales_data_pipeline_gcp_spark.operators.similarity",
        "sales_data_pipeline_gcp_spark.operators.text",
        "sales_data_pipeline_gcp_spark.operators.streaming_queries",
        "sales_data_pipeline_gcp_spark.operators.multimodal",
        "sales_data_pipeline_gcp_spark.operators.source_queries",
        "sales_data_pipeline_gcp_spark.operators.asof",
        "sales_data_pipeline_gcp_spark.operators.relational2",
        "sales_data_pipeline_gcp_spark.operators.skew",
        "sales_data_pipeline_gcp_spark.operators.grouped",
        "sales_data_pipeline_gcp_spark.operators.events_queries",
        "sales_data_pipeline_gcp_spark.operators.merge",
        "sales_data_pipeline_gcp_spark.operators.subqueries",
        "sales_data_pipeline_gcp_spark.operators.sampling",
        "sales_data_pipeline_gcp_spark.operators.corpus",
        "sales_data_pipeline_gcp_spark.operators.tpch",
        "sales_data_pipeline_gcp_spark.operators.components",
        "sales_data_pipeline_gcp_spark.operators.null_semantics",
        "sales_data_pipeline_gcp_spark.operators.sketches",
        "sales_data_pipeline_gcp_spark.operators.stats",
    ):
        importlib.import_module(mod)


def all_queries() -> dict[str, Query]:
    _load_all_modules()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in all_queries().values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in all_queries().values() if q.oracle is not None}
