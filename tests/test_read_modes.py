"""CSV parse-mode semantics (the reference relies on the default PERMISSIVE
mode turning malformed values into NULLs — scripts/process_sales.py:35;
a production engine also needs the strict and quarantine variants)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T


CSV = "a,b\n1,x\n2,y\nnot_an_int,z\n"
SCHEMA = T.StructType([T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())])


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text(CSV)
    return str(p)


def test_permissive_nulls_malformed(spark, csv_path):
    got = spark.read.csv(csv_path, header=True, schema=SCHEMA, mode="PERMISSIVE").collect()
    assert len(got) == 3
    assert sum(1 for r in got if r.a is None) == 1


def test_failfast_raises(spark, csv_path):
    with pytest.raises(Exception, match="Malformed|FAILFAST|BadRecord"):
        spark.read.csv(csv_path, header=True, schema=SCHEMA, mode="FAILFAST").collect()


def test_dropmalformed_skips(spark, csv_path):
    got = spark.read.csv(csv_path, header=True, schema=SCHEMA, mode="DROPMALFORMED").collect()
    assert [r.a for r in got] == [1, 2]


def test_corrupt_record_quarantine(spark, csv_path):
    schema = T.StructType(SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType())])
    got = spark.read.csv(
        csv_path, header=True, schema=schema, columnNameOfCorruptRecord="_corrupt_record"
    )
    bad = got.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and "not_an_int" in bad[0]._corrupt_record


def test_max_records_per_file_bounds_output(spark, tmp_path):
    # the small-files/huge-files guard for sinks: bounded rows per file
    out = str(tmp_path / "bounded")
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    df.coalesce(1).write.option("maxRecordsPerFile", 100).parquet(out)
    import glob

    files = glob.glob(out + "/*.parquet")
    assert len(files) >= 10
    assert spark.read.parquet(out).count() == 1000


def test_declared_parquet_schemas_match_inference(spark):
    """Drift guard for io.PARQUET_SCHEMAS (round 12): the declared reader
    schemas skip per-call footer inference, so they must equal what
    inference would produce on EVERY fixture dir present — a fixture
    regeneration that changes a type must fail here, not silently coerce
    in the vectorized reader."""
    import glob
    import os

    from pyspark.sql.types import _parse_datatype_string

    from sales_data_pipeline_gcp_spark.io import PARQUET_SCHEMAS

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked = 0
    for sf_dir in sorted(
        glob.glob("/root/testdata/sf*") + glob.glob(os.path.join(here, ".scale", "sf*"))
    ):
        for table, ddl in PARQUET_SCHEMAS.items():
            path = f"{sf_dir}/{table}.parquet"
            if not os.path.exists(path):
                continue
            inferred = spark.read.parquet(path).schema
            declared = _parse_datatype_string(ddl)
            assert declared == inferred, (
                f"{path}: declared {declared.simpleString()} != "
                f"inferred {inferred.simpleString()}"
            )
            checked += 1
    assert checked > 0, "no fixture dirs found to audit"
