"""End-to-end drop-in CLI parity: simulator emits CSVs into a landing dir,
the batch job cleans and appends — the reference's entry points A and C
(SURVEY.md §3.1/§3.3) driven through the engine's CLI surface."""

from __future__ import annotations

from sales_data_pipeline_gcp_spark import process_sales, simulate
from sales_data_pipeline_gcp_spark.cleaning import clean_sales
from sales_data_pipeline_gcp_spark.sources.sales import as_dataframe, generate_rows


def test_simulate_then_process(spark, tmp_path):
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "table")

    simulate.main(["--out_dir", raw, "--num_records", "80", "--iterations", "2", "--interval_min", "0", "--seed", "7"])

    n = process_sales.run(raw + "/*.csv", out, audit=True, spark=spark)
    expected_rows = generate_rows(80, seed=7) + generate_rows(80, seed=8)
    expected = clean_sales(as_dataframe(spark, expected_rows), audit=False)
    assert n == expected.count()

    back = spark.read.parquet(out)
    assert back.columns == ["product", "price", "quantity", "total", "ordered_at", "delivery_at", "processed_at"]
    # append semantics (reference scripts/process_sales.py:68): re-run doubles
    n2 = process_sales.run(raw + "/*.csv", out, audit=True, spark=spark)
    assert n2 == 2 * n
