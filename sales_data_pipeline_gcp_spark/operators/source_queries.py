"""Source-format coverage (SURVEY.md §2.3 sources/sinks): explicit-schema
CSV scan (the reference's only source, scripts/process_sales.py:25-35) and
JSON scan. Rows-only for the driver (the oracle sees only the parquet
fixtures); tests/test_sources.py asserts exact row round-trips.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from sales_data_pipeline_gcp_spark.io import read_json, read_sales_csv
from sales_data_pipeline_gcp_spark.plans.registry import register


@register(
    "q_scan_csv_schema",
    oracle=None,  # reads a self-generated temp CSV; round-trip pinned in tests
    doc="Header-aware CSV scan with the reference's explicit StructType "
    "(no inference — inference double-reads the data at scale), PERMISSIVE "
    "malformed->NULL handling, then the reference cleaning pipeline.",
    tags=("source",),
)
def q_scan_csv_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sales_data_pipeline_gcp_spark.cleaning import clean_sales
    from sales_data_pipeline_gcp_spark.sources.sales import generate_rows, write_csv

    base = tempfile.mkdtemp(prefix="csv_scan_")
    path = os.path.join(base, "sales.csv")
    write_csv(path, generate_rows(200, seed=21))
    return clean_sales(read_sales_csv(spark, path), audit=False)


@register(
    "q_scan_json",
    oracle=None,  # reads a self-generated temp JSONL; round-trip pinned in tests
    doc="JSON-lines scan with explicit schema (scale path: schema declared, "
    "single pass, malformed records -> NULL columns).",
    tags=("source",),
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    base = tempfile.mkdtemp(prefix="json_scan_")
    path = os.path.join(base, "events.jsonl")
    with open(path, "w") as f:
        for i in range(100):
            f.write(json.dumps({"id": i, "kind": "k" + str(i % 3), "score": i / 10.0}) + "\n")
        f.write('{"id": "not-an-int", "kind": "bad"}\n')  # malformed -> NULLs
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    return read_json(spark, path, schema)
