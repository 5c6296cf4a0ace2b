"""Deterministic ``sales_raw`` fixture generator (FIXTURES.md §1).

Reproduces the reference simulator's distribution and adversarial NULL
pattern (sales_data_simulator.py:43-68) with a seeded RNG:

- row index ``i % 5 == 0``  -> price = quantity = total = NULL (must be dropped)
- else price ~ per-product uniform int range;
  ``i % 2 == 0``           -> quantity ~ randint(1,10), total = price*quantity
  ``i % 2 == 1``           -> quantity = NULL, total = price * randint(1,10)
    (so the imputed ``floor(total/price)`` recovers an exact integer)
- ordered_at ~ month-start 2023-01..2023-10 + randint(0,10) days
- delivery_at = ordered_at + randint(0,10) days
"""

from __future__ import annotations

import csv
import random
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

from sales_data_pipeline_gcp_spark.io import SALES_SCHEMA

PRODUCTS = ["Mobile Phones", "Laptops", "Tablets", "Smart Watches", "Headphones"]
PRICE_RANGES = {
    "Mobile Phones": (10000, 150000),
    "Laptops": (30000, 200000),
    "Tablets": (5000, 50000),
    "Smart Watches": (2000, 30000),
    "Headphones": (500, 10000),
}
MONTH_STARTS = [datetime(2023, m, 1) for m in range(1, 11)]

FIELDS = ["product", "price", "quantity", "total", "ordered_at", "delivery_at"]


def generate_rows(n: int, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    rows: list[dict] = []
    for i in range(n):
        product = rng.choice(PRODUCTS)
        if i % 5 == 0:
            price = quantity = total = None
        else:
            lo, hi = PRICE_RANGES[product]
            price = float(rng.randint(lo, hi))
            if i % 2 == 0:
                quantity = rng.randint(1, 10)
                total = price * quantity
            else:
                quantity = None
                total = price * rng.randint(1, 10)
        ordered_at = rng.choice(MONTH_STARTS) + timedelta(days=rng.randint(0, 10))
        delivery_at = ordered_at + timedelta(days=rng.randint(0, 10))
        rows.append(
            {
                "product": product,
                "price": price,
                "quantity": quantity,
                "total": total,
                "ordered_at": ordered_at,
                "delivery_at": delivery_at,
            }
        )
    return rows


#: Hand-crafted edge rows (FIXTURES.md) — semantically required cases the
#: simulator can't produce (SURVEY.md §2.2).
EDGE_ROWS = [
    # exercises total-imputation using the already-imputed quantity ordering
    {"product": "Laptops", "price": 50000.0, "quantity": 2, "total": None},
    # partial-null row that must survive the filter; quantity passthrough
    {"product": "Tablets", "price": None, "quantity": 3, "total": 15000.0},
    # quantity imputation with NULL price -> floor(NULL) stays NULL
    {"product": "Headphones", "price": None, "quantity": None, "total": 9000.0},
]


def _with_dates(row: dict) -> dict:
    out = {"ordered_at": datetime(2023, 5, 1), "delivery_at": datetime(2023, 5, 6)}
    out.update(row)
    return out


def write_csv(path: str, rows: list[dict]) -> None:
    """Row-oriented CSV with header, reference field order
    (sales_data_simulator.py:80-85)."""
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDS)
        w.writeheader()
        for r in rows:
            out = dict(r)
            for ts in ("ordered_at", "delivery_at"):
                if out[ts] is not None:
                    out[ts] = out[ts].strftime("%Y-%m-%d %H:%M:%S")
            w.writerow(out)


def as_dataframe(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Rows -> DataFrame with the generator's naive wall-times interpreted
    in the SESSION timezone — the same rule Spark's CSV/JSON parsers apply
    to the files ``write_csv`` produces. Without this, PySpark converts
    naive datetimes with the Python PROCESS timezone (``TimestampType.
    toInternal`` uses ``time.mktime``), so a repo session (UTC) driven
    from a ``TZ=America/New_York`` process would disagree with the file
    path by the UTC offset — instants, not just rendering."""
    from zoneinfo import ZoneInfo

    tz = ZoneInfo(spark.conf.get("spark.sql.session.timeZone"))
    data = [
        tuple(
            v.replace(tzinfo=tz) if isinstance(v, datetime) else v
            for v in (r[f] for f in FIELDS)
        )
        for r in rows
    ]
    return spark.createDataFrame(data, schema=SALES_SCHEMA)
