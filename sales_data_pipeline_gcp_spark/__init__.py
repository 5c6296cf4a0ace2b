"""A PySpark-native analytics engine with the query and data-processing
capabilities of ``akum001/sales-data-pipeline-gcp`` (reference surveyed in
SURVEY.md), generalized to a full relational + LLM-data-pipeline operator
library designed for 100 TB scale.

Layout
------
- ``session``    : SparkSession factory (AQE on, UTC, sane shuffle partitions)
- ``io``         : typed readers/writers (parquet / CSV / JSON / streaming)
- ``cleaning``   : the reference's exact cleaning semantics, parameterized
                   (reference: scripts/process_sales.py)
- ``operators/`` : relational + extension operators (joins, aggs, windows,
                   dedup, similarity, text analysis)
- ``functions/`` : scalar/vector expression helpers (built-in-first)
- ``sources/``   : fixture/source generators (sales_raw per FIXTURES.md)
- ``plans/``     : the query registry that backs ``__spark_entry__.py``
- ``streaming/`` : file-source ingest + event-time windows
"""

__version__ = "0.1.0"
