"""Cross-engine deterministic hashing.

MinHash/SimHash need hash functions that BOTH Spark and the DuckDB oracle
can compute identically. Neither engine's native hash matches the other
(xxhash64 vs DuckDB's), so we derive a 60-bit integer from the first 15 hex
chars of md5 — md5 is identical everywhere, and 15 hex digits fit a signed
64-bit integer without overflow.

Seeded variants prepend a seed string, giving k independent hash functions
for MinHash signatures.

Scale note: md5 is ~10x costlier than xxhash64. At 100 TB you'd swap
``shared_hash`` for ``F.xxhash64`` once the oracle is no longer in the loop
— the operators take the hash column as input precisely so the hash family
is pluggable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def shared_hash(col: Column, seed: str = "") -> Column:
    """60-bit deterministic hash of a string column, identical to
    ``sql_shared_hash`` in DuckDB."""
    s = F.concat(F.lit(seed), col) if seed else col
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def sql_shared_hash(expr: str, seed: str = "") -> str:
    inner = f"'{seed}' || {expr}" if seed else expr
    return f"(('0x' || substring(md5({inner}), 1, 15))::BIGINT)"


def shared_hash32(col: Column, seed: str = "") -> Column:
    """32-bit variant of :func:`shared_hash` (first 8 hex chars of md5).

    Used as the BASE of derived hash families: k functions are synthesized
    as ``b1 + i*b2`` (Kirsch-Mitzenmacher double hashing) from two 32-bit
    bases, so the combination ``b1 + (k-1)*b2 < 2^32 * k`` stays far below
    2^63 — no overflow under ANSI arithmetic in either engine — while
    paying 2 md5s per input instead of k."""
    s = F.concat(F.lit(seed), col) if seed else col
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def sql_shared_hash32(expr: str, seed: str = "") -> str:
    inner = f"'{seed}' || {expr}" if seed else expr
    return f"(('0x' || substring(md5({inner}), 1, 8))::BIGINT)"
