"""Query registry package.

``registry`` is the single source of truth behind
``__spark_entry__.py::queries()/oracle_sql()`` — operator modules register
their declared queries at import time; importing this package pulls them all
in.
"""

from sales_data_pipeline_gcp_spark.plans import registry

__all__ = ["registry"]
