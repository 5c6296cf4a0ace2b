"""Skew-mitigation utilities (SURVEY.md §7 Phase 6).

AQE's skew-join splitting handles moderate skew automatically; these
utilities are for the pathological cases a 100 TB pipeline actually hits —
a handful of keys holding 10-30% of the data each:

- ``salted_agg``: two-phase aggregation — pre-aggregate on (key, salt) so
  no single reducer receives a hot key's full stream, then finalize on key.
  Works for any algebraic aggregate; with decimal-exact sums the result is
  bit-identical to the unsalted plan (order-independence is what the exact
  aggregation was built for).
- ``salted_join``: replicate the small side ``n_salt`` times, split the hot
  big side deterministically by hashing a high-cardinality disambiguator
  column; each replica joins 1/n of the hot key's rows.

Both are declared as queries whose oracle is the PLAIN (unsalted) SQL — the
parity gate proves salting is semantically invisible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.functions.exact import exact_sum, sql_sum
from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.plans.registry import register

DEFAULT_SALT = 16


def with_salt(df: DataFrame, disambiguator: Column, n_salt: int = DEFAULT_SALT) -> DataFrame:
    """Deterministic salt in [0, n_salt): hash a column that varies within
    the hot key (NOT rand() — retries/speculative tasks must re-derive the
    same salt or results drift)."""
    return df.withColumn("__salt", F.pmod(F.xxhash64(disambiguator), F.lit(n_salt)))


def salted_sum_count(
    df: DataFrame, keys: list[str], sum_col: str, disambiguator: Column, n_salt: int = DEFAULT_SALT
) -> DataFrame:
    """Two-phase salted aggregation: (keys+salt) partials, then keys final.
    Returns columns: *keys, sum_<col>, n_rows."""
    partial = (
        with_salt(df, disambiguator, n_salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.sum(F.col(sum_col).cast("decimal(38,2)")).alias("__psum"),
            F.count("*").alias("__pcnt"),
        )
    )
    return partial.groupBy(*keys).agg(
        # string-routed final decimal->double (functions/exact.py):
        # magnitude-independent, matching the sql_sum oracle form
        F.sum("__psum").cast("string").cast("double").alias(f"sum_{sum_col}"),
        F.sum("__pcnt").alias("n_rows"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    disambiguator: Column,
    n_salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Shuffle-join a skewed big side against a small side: the small side
    is exploded n_salt ways so the join key becomes (key, salt) and a hot
    key's rows spread over n_salt reducers."""
    big_s = with_salt(big, disambiguator, n_salt)
    small_s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return big_s.join(small_s, [key, "__salt"]).drop("__salt")


@register(
    "q_agg_salted",
    oracle=f"""
    SELECT l_returnflag,
           {sql_sum('l_extendedprice', 2)} AS sum_l_extendedprice,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Salted two-phase aggregation on a deliberately hot key (3 distinct "
    "return flags over the whole table). Oracle is the PLAIN group-by: "
    "salting must be semantically invisible, and decimal-exact sums make "
    "it bit-identical.",
    tags=("agg", "skew"),
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return salted_sum_count(
        li, ["l_returnflag"], "l_extendedprice", disambiguator=F.col("l_orderkey")
    )


@register(
    "q_join_salted",
    oracle=f"""
    WITH dim AS (
        SELECT l_returnflag AS flag, COUNT(*) AS flag_rows
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           COUNT(*) AS n,
           MIN(flag_rows) AS flag_rows,
           {sql_sum('l_quantity', 2)} AS sum_qty
    FROM lineitem JOIN dim ON l_returnflag = flag
    GROUP BY l_returnflag
    """,
    doc="Salted shuffle join: every lineitem row joins a 3-row dim on the "
    "hot returnflag key; the dim is exploded 16x so no reducer sees a full "
    "hot key. Oracle is the plain join.",
    tags=("join", "skew"),
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    dim = li.groupBy(F.col("l_returnflag").alias("flag")).agg(F.count("*").alias("flag_rows"))
    joined = salted_join(
        li.withColumnRenamed("l_returnflag", "flag"),
        dim,
        "flag",
        disambiguator=F.col("l_orderkey"),
    )
    return (
        joined.groupBy(F.col("flag").alias("l_returnflag"))
        .agg(
            F.count("*").alias("n"),
            F.min("flag_rows").alias("flag_rows"),
            exact_sum("l_quantity", 2).alias("sum_qty"),
        )
    )
