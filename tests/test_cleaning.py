"""Reference-semantics unit tests (SURVEY.md §5.2 item 2) + property-based
NULL fuzzing (item 3) for the cleaning pipeline."""

from __future__ import annotations

import math
import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sales_data_pipeline_gcp_spark.cleaning import clean_sales
from sales_data_pipeline_gcp_spark.sources.sales import (
    EDGE_ROWS,
    _with_dates,
    as_dataframe,
    generate_rows,
)


def run_clean(spark, rows):
    df = as_dataframe(spark, [_with_dates(r) for r in rows])
    out = clean_sales(df, audit=False)
    return {(r.product, r.price, r.quantity, r.total) for r in out.collect()}


def test_edge_rows(spark):
    got = run_clean(spark, EDGE_ROWS)
    assert got == {
        # total imputed from price * (passthrough) quantity, round to 2
        ("Laptops", 50000.0, 2, 100000.0),
        # partial-null survives; quantity passthrough; price stays NULL
        ("Tablets", None, 3, 15000.0),
        # floor(total / NULL price) -> NULL quantity; total passthrough
        ("Headphones", None, None, 9000.0),
    }


def test_div_zero_price_imputes_null(spark):
    # Deviation from the Spark-3.3 reference (Infinity -> floor overflow):
    # ANSI-safe try_divide imputes NULL on a zero divisor (cleaning.py).
    got = run_clean(spark, [{"product": "Tablets", "price": 0.0, "quantity": None, "total": 5000.0}])
    assert got == {("Tablets", 0.0, None, 5000.0)}


def test_simulator_pattern(spark):
    """The simulator's NULL pattern (FIXTURES.md): i%5==0 rows dropped,
    odd rows get quantity imputed exactly."""
    rows = generate_rows(100, seed=7)
    df = as_dataframe(spark, rows)
    out = clean_sales(df, audit=False).collect()
    # every 5th row dropped
    assert len(out) == sum(1 for i in range(100) if i % 5 != 0)
    for r in out:
        assert not (r.price is None and r.quantity is None and r.total is None)
        assert r.quantity is not None  # price>0 and total=price*k -> exact k
        assert r.total == pytest.approx(float(r.price) * r.quantity, rel=1e-6)


def test_audit_column(spark):
    rows = generate_rows(10, seed=1)
    out = clean_sales(as_dataframe(spark, rows), audit=True)
    assert out.columns == ["product", "price", "quantity", "total", "ordered_at", "delivery_at", "processed_at"]
    vals = [r.processed_at for r in out.collect()]
    # current_timestamp() folds to a per-query constant (SURVEY.md §2.2.5)
    assert len(set(vals)) == 1


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.booleans(), st.booleans(), st.booleans()), min_size=1, max_size=30), st.integers(0, 2**31))
def test_null_mask_properties(spark, masks, seed):
    """Invariants from scripts/process_sales.py:38-49 under arbitrary masks."""
    rng = random.Random(seed)
    rows = []
    for pn, qn, tn in masks:
        price = None if pn else float(rng.randint(500, 200000))
        qty = None if qn else rng.randint(1, 10)
        total = None if tn else float(rng.randint(500, 2000000))
        rows.append({"product": "Laptops", "price": price, "quantity": qty, "total": total})
    df = as_dataframe(spark, [_with_dates(r) for r in rows])
    out = clean_sales(df, audit=False).collect()

    survivors = [r for r in rows if not (r["price"] is None and r["quantity"] is None and r["total"] is None)]
    assert len(out) == len(survivors)
    for r in out:
        # quantity NULL only if it could not be imputed (total or price NULL)
        if r.quantity is None:
            assert r.price is None or r.total is None
        # total NULL only if price or quantity (post-impute) NULL
        if r.total is None:
            assert r.price is None or r.quantity is None


def test_imputed_quantity_is_floor(spark):
    rows = [{"product": "Laptops", "price": 300.0, "quantity": None, "total": 1000.0}]
    got = run_clean(spark, rows)
    assert got == {("Laptops", 300.0, math.floor(1000.0 / 300.0), 1000.0)}
