"""Local replica of the driver's oracle-differential gate (SURVEY.md §5.2):
run a declared Spark query and its DuckDB oracle SQL on the same parquet
fixtures, compare row-count + schema-shape + order-insensitive values.

Comparison is EXACT on floats — the engine's queries are written (decimal
accumulation, deterministic tie-breaks) so both engines produce bit-identical
doubles; if exactness holds here, any reasonable driver value-hash matches.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from sales_data_pipeline_gcp_spark.io import TABLES


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


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "query") -> None:
    got = spark_df.toPandas()
    assert sorted(got.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(got.columns)} oracle={sorted(oracle_df.columns)}"
    )
    assert len(got) == len(oracle_df), f"{name}: row count spark={len(got)} oracle={len(oracle_df)}"
    g, o = canon(got), canon(oracle_df)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(g, o)) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
