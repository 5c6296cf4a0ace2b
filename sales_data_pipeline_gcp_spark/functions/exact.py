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

Scale-selection rule (learned the hard way at sf0.1): pick the SMALLEST
scale that exactly represents the per-row values, because the final
decimal->double conversion is only guaranteed identical cross-engine while
``sum * 10^s < 2^53`` — beyond that, DuckDB's int128->double pre-rounding
before the 10^s division can differ from Spark's correctly-rounded
BigDecimal conversion by 1 ulp. A 2-decimal money column summed to ~1e9 at
scale 6 leaves 4 orders of margin; scale 8 does not.
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
