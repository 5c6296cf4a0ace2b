"""Cross-engine-exact aggregate helpers.

Problem (SURVEY.md §7 hard-part #1): ``SUM(double)`` is order-dependent —
Spark's partial aggregation over 32 partitions and DuckDB's single-threaded
sum add in different orders, so the last few bits of the result differ and an
exact value-hash comparison fails.

Fix: accumulate exactly. Cast each row's (deterministic, IEEE-identical)
double value to a wide decimal, sum the decimals (exact, associative —
order-independent), and cast the final total back to DOUBLE. Both engines
then produce the *same* 64-bit float no matter how the sum was parallelized.

The double->decimal rounding at scale ``s`` is unambiguous whenever the
underlying exact value has fewer than ``s`` decimal digits (true for all
fixture money/quantity columns and their 2-3-factor products), so Spark's
HALF_UP and DuckDB's rounding cannot disagree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: decimal(38, s) leaves 38-s integral digits — vastly more than any
#: fixture aggregate needs, and identical in both engines.
PRECISION = 38


def dec(col: Column | str, scale: int = 6) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({PRECISION},{scale})")


def exact_sum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent SUM over a double column, returned as DOUBLE.

    SQL oracle equivalent: ``CAST(SUM(CAST(x AS DECIMAL(38,s))) AS DOUBLE)``.
    """
    return F.sum(dec(col, scale)).cast("double")


def exact_avg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG as exact-decimal-sum / count (double division).

    SQL oracle: ``CAST(SUM(CAST(x AS DECIMAL(38,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c, scale) / F.count(c)


def sql_sum(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({PRECISION},{scale}))) AS DOUBLE)"


def sql_avg(expr: str, scale: int = 6) -> str:
    return f"{sql_sum(expr, scale)} / COUNT({expr})"
