"""Local replica of the driver's oracle-differential gate (SURVEY.md §5.2):
run a declared Spark query and its DuckDB oracle SQL on the same parquet
fixtures, compare row-count + schema-shape + order-insensitive values.

Comparison is EXACT on floats — the engine's queries are written (decimal
accumulation, deterministic tie-breaks) so both engines produce bit-identical
doubles; if exactness holds here, any reasonable driver value-hash matches.

Round-2 hardening, mirroring two driver behaviors the round-1 local suite
missed (VERDICT.md "What's wrong"):

- the driver's value hash is DTYPE-sensitive (Spark BIGINT vs DuckDB DOUBLE
  fails even when values are equal), so ``compare`` now asserts the pandas
  dtype KINDS of both frames match column-by-column;
- the driver's canonicalizer crashes on list/dict cells, so ``compare``
  rejects any declared output whose cells are lists, dicts, or ndarrays —
  declared queries must serialize nested values to strings/scalars.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from sales_data_pipeline_gcp_spark.io import TABLES

#: The adjudication environment runs DuckDB 1.0.0 — every oracle must
#: execute on that dialect (round 5's q_calendarize shipped green locally
#: on a construct 1.0.0 rejects). A newer local DuckDB is allowed for
#: development, but the version is logged per run and known-unsupported
#: constructs are grep-linted in tests/test_plan_lint.py.
ORACLE_DUCKDB_VERSION = "1.0.0"
print(f"parity: duckdb {duckdb.__version__} (oracle contract: {ORACLE_DUCKDB_VERSION})")


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return con.execute(sql).df()
    finally:
        con.close()


def _cell(v):
    """Canonicalize one value for order-insensitive comparison."""
    if v is None:
        return None
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_cell(x) for x in v)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if isinstance(v, np.datetime64):
        return pd.Timestamp(v).to_pydatetime().replace(tzinfo=None)
    if hasattr(v, "as_py"):  # pyarrow scalar
        return _cell(v.as_py())
    if isinstance(v, float) and math.isnan(v):
        return None
    return v

def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


def _assert_no_nested_cells(df: pd.DataFrame, side: str, name: str) -> None:
    """The driver's canonicalizer raises ``unhashable type: 'list'`` on any
    list/dict cell; fail loudly here instead of green-locally/red-driver."""
    for col in df.columns:
        if df[col].dtype == object and len(df):
            bad = df[col].map(lambda v: isinstance(v, (list, dict, np.ndarray))).any()
            assert not bad, (
                f"{name}: {side} column {col!r} holds list/dict cells — the driver "
                "canonicalizer cannot hash these; serialize to string/scalars "
                "in the declared query"
            )


def _kind(dtype) -> str:
    """Comparable dtype class: integer/float/bool/datetime/object."""
    k = dtype.kind
    return {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "datetime", "m": "timedelta"}.get(
        k, "object"
    )


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "query") -> None:
    got = spark_df.toPandas()
    assert sorted(got.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(got.columns)} oracle={sorted(oracle_df.columns)}"
    )
    assert len(got) == len(oracle_df), f"{name}: row count spark={len(got)} oracle={len(oracle_df)}"
    _assert_no_nested_cells(got, "spark", name)
    _assert_no_nested_cells(oracle_df, "oracle", name)
    kind_diffs = [
        (c, str(got[c].dtype), str(oracle_df[c].dtype))
        for c in sorted(got.columns)
        if _kind(got[c].dtype) != _kind(oracle_df[c].dtype)
    ]
    assert not kind_diffs, (
        f"{name}: dtype-kind mismatches (driver hash is dtype-sensitive; pin "
        f"widths with casts on both sides): {kind_diffs}"
    )
    g, o = canon(got), canon(oracle_df)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(g, o)) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
