"""Source/sink round-trip tests (SURVEY.md §2.3 sources/sinks)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.cleaning import clean_sales
from sales_data_pipeline_gcp_spark.io import read_sales_csv, write_append
from sales_data_pipeline_gcp_spark.sources.sales import as_dataframe, generate_rows, write_csv


def test_csv_roundtrip_with_nulls(spark, tmp_path):
    rows = generate_rows(100, seed=33)
    path = str(tmp_path / "sales.csv")
    write_csv(path, rows)
    got = read_sales_csv(spark, path)
    expected = as_dataframe(spark, rows)
    key = lambda r: repr((r.product, r.price, r.quantity, r.total, r.ordered_at, r.delivery_at))
    assert sorted(map(key, got.collect())) == sorted(map(key, expected.collect()))
    # NULLs survive the CSV round-trip (empty field -> NULL, PERMISSIVE)
    assert got.filter(F.col("price").isNull()).count() == sum(1 for r in rows if r["price"] is None)


def test_scan_queries_return_rows(spark, sf_dir):
    from sales_data_pipeline_gcp_spark.operators.source_queries import q_scan_csv_schema, q_scan_json

    csv_df = q_scan_csv_schema(spark, sf_dir)
    assert csv_df.count() == clean_sales(as_dataframe(spark, generate_rows(200, seed=21)), audit=False).count()

    json_df = q_scan_json(spark, sf_dir)
    assert json_df.count() == 101
    malformed = json_df.filter(F.col("id").isNull())
    assert malformed.count() == 1  # PERMISSIVE: bad record -> NULL columns


def test_partitioned_append_sink(spark, tmp_path):
    out = str(tmp_path / "sink")
    rows = generate_rows(50, seed=44)
    df = clean_sales(as_dataframe(spark, rows), audit=False)
    write_append(df, out, partition_by=["product"])
    write_append(df, out, partition_by=["product"])  # append-only: doubles
    back = spark.read.parquet(out)
    assert back.count() == 2 * df.count()
    # partition pruning must reach the scan: the filter appears as a
    # PartitionFilter (directory-level pruning), not a data filter
    some = back.filter(F.col("product") == "Laptops")
    plan = some._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "product" in plan.split("PartitionFilters")[1][:200]


def test_write_append_partitioned_layout(spark, tmp_path):
    """The engine's partitioned sink produces the same hive layout (and
    content) as the pyarrow-written pruning fixture: writing the fixture's
    rows via write_append(partition_by=['sale_month']) and reading both
    back yields identical relations, and the sink's directories follow the
    sale_month=M naming that partition discovery and DuckDB's
    hive_partitioning both understand."""
    from sales_data_pipeline_gcp_spark.operators.source_queries import (
        PART_DIR,
        PART_ROWS,
        PART_SEED,
        ensure_partitioned_fixture,
    )

    ensure_partitioned_fixture()
    fixture = spark.read.parquet(PART_DIR)

    rows = generate_rows(PART_ROWS, seed=PART_SEED)
    df = as_dataframe(spark, rows).select(
        "product",
        "price",
        "quantity",
        "total",
        F.to_date("ordered_at").alias("ordered_date"),
        F.month("ordered_at").alias("sale_month"),
    )
    out = str(tmp_path / "sink")
    write_append(df, out, partition_by=["sale_month"])
    assert sorted(
        d for d in os.listdir(out) if d.startswith("sale_month=")
    ) == sorted(d for d in os.listdir(PART_DIR) if d.startswith("sale_month="))

    back = spark.read.parquet(out)
    key = lambda r: repr(
        (r.product, r.price, r.quantity, r.total, r.ordered_date, int(r.sale_month))
    )
    assert sorted(map(key, back.collect())) == sorted(map(key, fixture.collect()))


def test_compaction(spark, tmp_path):
    from sales_data_pipeline_gcp_spark.io import compact

    out = str(tmp_path / "fragmented")
    for i in range(6):  # six tiny appends -> many small files
        spark.range(i * 100, (i + 1) * 100).write.mode("append").parquet(out)
    import glob

    before = len(glob.glob(out + "/*.parquet"))
    n = compact(spark, out, target_files=2)
    after = len(glob.glob(out + "/*.parquet"))
    assert n == 600 and after <= 2 < before
    assert spark.read.parquet(out).agg({"id": "sum"}).collect()[0][0] == sum(range(600))


def test_schema_evolution_merge(spark, tmp_path):
    """Schema drift on an append table: a later batch adds a column;
    mergeSchema reads the superset with NULLs for old files — the
    compatible-evolution path (incompatible type changes still fail)."""
    out = str(tmp_path / "evolving")
    spark.range(5).selectExpr("id", "id * 2 AS v").write.mode("append").parquet(out)
    spark.range(5, 8).selectExpr("id", "id * 2 AS v", "'x' AS tag").write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", True).parquet(out)
    assert set(merged.columns) == {"id", "v", "tag"}
    assert merged.count() == 8
    assert merged.filter("tag IS NULL").count() == 5


def test_udtf_chunks_matches_python(spark):
    import hashlib

    from sales_data_pipeline_gcp_spark.io import load
    from sales_data_pipeline_gcp_spark.operators.source_queries import (
        UDTF_CHUNK_WORDS,
        q_udtf_chunks,
    )
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    expected = {}
    for r in docs:
        words = [w for w in r.text.split(" ") if w]
        for i in range(0, len(words), UDTF_CHUNK_WORDS):
            chunk = words[i : i + UDTF_CHUNK_WORDS]
            expected[(int(r.doc_id), i // UDTF_CHUNK_WORDS)] = (
                len(chunk),
                hashlib.md5(" ".join(chunk).encode()).hexdigest(),
            )
    got = {
        (int(r.doc_id), int(r.chunk_idx)): (int(r.n_words), r.chunk_md5)
        for r in q_udtf_chunks(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_scan_csv_quoted_content_fidelity(spark):
    from sales_data_pipeline_gcp_spark.operators.source_queries import q_scan_csv_quoted

    rows = {int(r.id): r for r in q_scan_csv_quoted(spark, "unused").collect()}
    assert rows[2].name == "comma, inside" and rows[2].note == 'double " quote'
    assert rows[3].name == "line\nbreak" and rows[3].note == "crlf\r\nbreak"
    assert rows[4].name == "ünïcødé ✓" and rows[4].note == "tab\there"
    # quoted empty reads as NULL in BOTH engines (Spark nullValue=''
    # applies to quoted fields too; DuckDB nullstr matches) — verified
    # identical by the parity gate, documented in the query docstring
    assert rows[5].name is None and rows[5].name_len is None
    assert rows[4].name_len == len("ünïcødé ✓")


def test_scan_text_preserves_raw_lines(spark):
    from sales_data_pipeline_gcp_spark.operators.source_queries import (
        _TEXT_LINES,
        q_scan_text,
    )

    got = {r.value for r in q_scan_text(spark, "unused").collect()}
    assert got == set(_TEXT_LINES)  # whitespace, quotes, delimiters intact
