"""Streaming file ingest — the Spark-native replacement for the reference's
event-driven control plane (SURVEY.md §3.2):

reference                                   | here
--------------------------------------------|----------------------------------
GCS object.finalize event -> Cloud Function | file lands in a watched directory
prefix/suffix routing (main.py:21-23)       | ``pathGlobFilter`` + dir scoping
one Dataproc job per file (main.py:27-49)   | one micro-batch per trigger
append to BigQuery, at-least-once           | checkpointed parquet append,
                                            |   EXACTLY-once (file-source log)

The file-source checkpoint records which input files each batch consumed, so
re-delivery/restart cannot duplicate rows — an upgrade over the reference's
at-least-once story (SURVEY.md §2.2.6). ``Trigger.AvailableNow`` drains all
pending files then stops, which is the batch-friendly form of the
simulator's 10-minute drop cadence.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from sales_data_pipeline_gcp_spark.cleaning import clean_sales
from sales_data_pipeline_gcp_spark.io import SALES_SCHEMA


def ingest_sales_stream(
    spark: SparkSession,
    raw_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    glob: str = "*.csv",
    audit: bool = True,
) -> StreamingQuery:
    """Watch ``raw_dir`` for CSVs (routing predicate ≙ main.py:21-23), run
    the reference cleaning pipeline on each micro-batch, append parquet
    exactly-once. Returns the started AvailableNow query; call
    ``awaitTermination()`` to drain."""
    raw = (
        spark.readStream.schema(SALES_SCHEMA)
        .option("header", True)
        .option("pathGlobFilter", glob)
        .csv(raw_dir)
    )
    cleaned = clean_sales(raw, audit=audit)
    return (
        cleaned.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
