"""Scalar expression surface (SURVEY.md §2.3 projection/filter rows):
string, math, date/time, array (higher-order), and JSON functions.

Everything is a built-in ``pyspark.sql.functions`` expression — JVM-side,
inside whole-stage codegen, no Python in the hot path. Each query documents
the cross-engine fine print it navigates (SURVEY.md §7 hard-part #1):
Spark/DuckDB differ on dayofweek origin, date_add return types, and NULL
sort defaults, so the queries spell those out explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.plans.registry import register


@register(
    "q_string_scalars",
    oracle="""
    SELECT p_partkey,
           LOWER(p_name)                                    AS name_lower,
           UPPER(p_brand)                                   AS brand_upper,
           TRIM(p_type)                                     AS type_trim,
           LENGTH(p_name)                                   AS name_len,
           SUBSTRING(p_name, 1, 5)                          AS name_head,
           CONCAT(p_brand, ':', p_type)                     AS brand_type,
           REGEXP_EXTRACT(p_name, '^(\\w+)', 1)             AS first_word,
           (p_type LIKE '%a%')                              AS has_a,
           REPLACE(p_name, ' ', '_')                        AS name_snake
    FROM part
    """,
    doc="String scalar pack over part: case, trim, length, substring, "
    "concat, regexp_extract, LIKE, replace. All 1-based, Spark == DuckDB.",
    tags=("scalar",),
)
def q_string_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim("p_type").alias("type_trim"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.col("p_type").like("%a%").alias("has_a"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
    )


@register(
    "q_math_scalars",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_extendedprice - 50000.0)          AS abs_dev,
           CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT)  AS price_kilo_ceil,
           CAST(FLOOR(l_quantity / 7.0) AS BIGINT)         AS qty_weeks,
           ROUND(l_extendedprice * 0.07, 2)        AS fee,
           SQRT(l_extendedprice)                   AS price_sqrt,
           POWER(l_discount, 2)                    AS disc_sq,
           l_orderkey % 97                         AS key_mod
    FROM lineitem
    """,
    doc="Math scalar pack: abs/ceil/floor/round/sqrt/power/modulo. sqrt is "
    "IEEE-exact and power(x,2) is an exact multiply, so doubles match "
    "bit-for-bit cross-engine; transcendental pow/log/exp are deliberately "
    "NOT in oracle queries (libm last-ulp divergence). ceil/floor output "
    "WIDTH is pinned on both sides: Spark returns BIGINT, DuckDB DOUBLE — "
    "value-equal but dtype-divergent, which a dtype-sensitive value hash "
    "rejects (adjudicated FAIL in round 1).",
    tags=("scalar",),
)
def q_math_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("abs_dev"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_kilo_ceil"),
        F.floor(F.col("l_quantity") / 7.0).alias("qty_weeks"),
        F.round(F.col("l_extendedprice") * 0.07, 2).alias("fee"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.pow("l_discount", 2).alias("disc_sq"),
        (F.col("l_orderkey") % 97).alias("key_mod"),
    )


@register(
    "q_date_scalars",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INTEGER)                            AS order_year,
           CAST(MONTH(o_orderdate) AS INTEGER)                           AS order_month,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS INTEGER)                   AS order_dow,
           DATE_TRUNC('month', o_orderdate)                              AS month_start,
           o_orderdate + INTERVAL 7 DAY                                  AS week_later,
           CAST(DATE_DIFF('day', DATE_TRUNC('month', o_orderdate), o_orderdate) AS INTEGER)
                                                                         AS day_in_month,
           STRFTIME(o_orderdate, '%Y-%m-%d')                             AS order_date_str
    FROM orders
    """,
    doc="Date/time scalar pack. Cross-engine traps handled: Spark DAYOFWEEK "
    "is 1=Sunday vs DuckDB 0=Sunday (+1 in oracle); Spark date_add returns "
    "DATE so timestampadd keeps TIMESTAMP; widths pinned with casts. "
    "Timestamps are NTZ end-to-end -> session-timezone-proof.",
    tags=("scalar",),
)
def q_date_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.expr("timestampadd(DAY, 7, o_orderdate)").alias("week_later"),
        F.datediff(F.col("o_orderdate"), F.date_trunc("month", F.col("o_orderdate")))
        .cast("int")
        .alias("day_in_month"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
    )


@register(
    "q_array_scalars",
    oracle="""
    SELECT vec_id,
           label,
           LENGTH(embedding)                       AS dim,
           CAST(embedding[1] AS DOUBLE)            AS first_elem,
           CAST(embedding[1] AS DOUBLE)            AS head_1,
           CAST(embedding[2] AS DOUBLE)            AS head_2,
           CAST(embedding[3] AS DOUBLE)            AS head_3,
           CAST(LIST_SUM(LIST_TRANSFORM(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE)  AS sq_norm
    FROM embeddings
    """,
    doc="Array/higher-order surface over embeddings: size, element_at, "
    "slice, transform+aggregate (sum of squares). Elements are cast to "
    "DOUBLE before multiply-accumulate so both engines run the identical "
    "sequential double reduction. The slice is surfaced as three scalar "
    "DOUBLE columns, not a raw array<float> cell: float->double casts are "
    "exact, and the declared output stays free of list cells (the driver "
    "canonicalizer cannot hash them — round-1 harness ERR).",
    tags=("scalar", "array"),
)
def q_array_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    sq_norm = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    head3 = F.slice("embedding", 1, 3)
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        *[F.element_at(head3, i + 1).cast("double").alias(f"head_{i + 1}") for i in range(3)],
        sq_norm.alias("sq_norm"),
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           event_type,
           value,
           JSON_EXTRACT_STRING(props, '$.k')            AS k_str,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_int
    FROM events
    """,
    doc="JSON scalar surface over events.props: path extraction as string "
    "and typed cast. Spark side also exercises from_json -> struct field "
    "access (same value, schema-checked in tests).",
    tags=("scalar", "json"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k BIGINT")["k"].alias("k_int"),
    )


# ---------------------------------------------------------------------------
# Semi-structured log parsing round-trip (round 5)
# ---------------------------------------------------------------------------

#: access-log line synthesized from orders with dialect-neutral SQL (runs
#: verbatim in Spark and DuckDB): ip - - [ts] "METHOD /path?u=id PROTO"
#: status bytes. The cents modulus goes through DECIMAL(38,0) so the
#: double->integer rounding is half-up in BOTH engines (the repo-wide
#: cents idiom), and every varying field round-trips through the parse.
_LOG_LINE_SQL = (
    "'10.' || CAST(o_custkey % 251 AS STRING) || '.0.1 - - "
    "[01/Jan/1996:00:00:00] \"' || "
    "CASE CAST(o_custkey % 4 AS INTEGER) WHEN 0 THEN 'GET' WHEN 1 THEN 'POST' "
    "WHEN 2 THEN 'PUT' ELSE 'DELETE' END || "
    "' /orders/' || CAST(o_orderkey AS STRING) || '?u=' || "
    "CAST(o_custkey AS STRING) || ' HTTP/1.1\" ' || "
    "CAST(200 + (o_orderkey % 3) * 102 AS STRING) || ' ' || "
    "CAST(CAST(CAST(o_totalprice * 100 AS DECIMAL(38,0)) AS BIGINT) % 10000 "
    "AS STRING)"
)

#: parse patterns — Java-regex/RE2 common subset (explicit classes, no
#: shorthand escapes, no lookaround), same contract as q_text_redact.
_LOG_METHOD_RE = '"([A-Z]+) '
_LOG_USER_RE = "u=([0-9]+)"
_LOG_STATUS_RE = '" ([0-9]+) '
#: the ONE $-anchored pattern in the package: Java '$' matches before a
#: FINAL line terminator, RE2 '$' only at end-of-text (divergence pinned
#: in tests/test_differential_fuzz.py::test_dollar_anchor_domain_boundary)
#: — safe here because _LOG_LINE_SQL emits no newlines; any $-anchored
#: extraction over free text must strip trailing newlines first.
_LOG_BYTES_RE = " ([0-9]+)$"


@register(
    "q_parse_logs",
    oracle=f"""
    WITH lines AS (
        SELECT {_LOG_LINE_SQL} AS line FROM orders
    ),
    parsed AS (
        SELECT regexp_extract(line, '{_LOG_METHOD_RE}', 1)                 AS method,
               CAST(regexp_extract(line, '{_LOG_STATUS_RE}', 1) AS BIGINT) AS status,
               CAST(regexp_extract(line, '{_LOG_USER_RE}', 1) AS BIGINT)   AS user_id,
               CAST(regexp_extract(line, '{_LOG_BYTES_RE}', 1) AS BIGINT)  AS n_bytes
        FROM lines
    )
    SELECT method, status,
           CAST(COUNT(*) AS BIGINT)                 AS n_requests,
           CAST(COUNT(DISTINCT user_id) AS BIGINT)  AS n_users,
           CAST(SUM(n_bytes) AS BIGINT)             AS total_bytes
    FROM parsed
    GROUP BY method, status
    ORDER BY method, status
    """,
    doc="Semi-structured access-log ETL round-trip: synthesize an Apache-"
    "style log line per order with ONE dialect-neutral SQL expression "
    "both engines run verbatim, then recover every typed field by regex "
    "(method, status, user id, byte count) and aggregate per (method, "
    "status) cell. Patterns stay in the Java-regex/RE2 common subset "
    "(explicit character classes, anchors only) — the same cross-engine "
    "contract q_text_redact established — so extraction is bit-identical. "
    "The whole pipeline is narrow maps into one partial-aggregated "
    "shuffle; regexp_extract is a JVM codegen expression, so at 100 TB "
    "log parsing runs at scan speed with zero Python. The aggregate "
    "compares every parsed field against the generator's value space, "
    "making silent parse drift (lost rows, truncated captures, "
    "mis-anchored groups) show up as a hash mismatch.",
    tags=("scalar", "text"),
)
def q_parse_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lines = orders.select(F.expr(_LOG_LINE_SQL).alias("line"))
    parsed = lines.select(
        F.regexp_extract("line", _LOG_METHOD_RE, 1).alias("method"),
        F.regexp_extract("line", _LOG_STATUS_RE, 1).cast("bigint").alias("status"),
        F.regexp_extract("line", _LOG_USER_RE, 1).cast("bigint").alias("user_id"),
        F.regexp_extract("line", _LOG_BYTES_RE, 1).cast("bigint").alias("n_bytes"),
    )
    return (
        parsed.groupBy("method", "status")
        .agg(
            F.count("*").alias("n_requests"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .orderBy("method", "status")
    )


# ---------------------------------------------------------------------------
# Business-day (weekday) interval arithmetic (round 5)
# ---------------------------------------------------------------------------

#: promised-delivery span per order: 3..27 calendar days.
_BIZ_SPAN_SQL = "o_orderkey % 25 + 3"

#: day-number of the reference Monday 1970-01-05: weekday math anchors here
#: so `n mod 7` enumerates Mon..Sun directly.
_REF_MONDAY = 4


def _sql_weekdays_before(day_expr: str, div: str) -> str:
    """# of weekdays in [1970-01-05, day): closed form, no calendar scan.

    With n = day - 4 (days since the reference Monday, >= 0 for all fixture
    dates), full weeks contribute 5 each and the partial week contributes
    min(n mod 7, 5) — Mon..Fri count, Sat/Sun saturate.
    """
    n = f"({day_expr} - {_REF_MONDAY})"
    return f"(5 * ({n} {div} 7) + LEAST({n} % 7, 5))"


@register(
    "q_business_days",
    oracle=f"""
    WITH spans AS (
        SELECT o_orderpriority,
               date_diff('day', DATE '1970-01-01', o_orderdate) AS d0,
               date_diff('day', DATE '1970-01-01', o_orderdate)
                   + ({_BIZ_SPAN_SQL}) AS d1
        FROM orders
    ), counted AS (
        SELECT o_orderpriority,
               {_sql_weekdays_before('d1 + 1', '//')}
             - {_sql_weekdays_before('d0', '//')} AS biz_days
        FROM spans
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT)        AS n_orders,
           CAST(SUM(biz_days) AS BIGINT)   AS sum_biz_days,
           CAST(MIN(biz_days) AS BIGINT)   AS min_biz_days,
           CAST(MAX(biz_days) AS BIGINT)   AS max_biz_days,
           CAST(SUM(biz_days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_biz_days
    FROM counted
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Business-day interval arithmetic — SLA math every fulfillment "
    "pipeline needs: weekdays in each order's promised window [orderdate, "
    "orderdate + 3..27d], via the CLOSED FORM weekdays-before(d) = "
    "5*(n div 7) + min(n mod 7, 5) anchored at a reference Monday — no "
    "calendar-spine explode, no day-by-day scan, just integer div/mod on "
    "the epoch day number, also how you'd push a business-day SLA filter "
    "down to a scan predicate. Inclusive count = wd(end+1) - wd(start). "
    "Orders are midnight-aligned so epoch//86400 is timezone-free (the "
    "q_grouped_trend precedent); every value through the aggregate is an "
    "exact integer and the single avg division is the only float op. "
    "Shape: narrow map into one partial-aggregated shuffle over 5 "
    "priority groups — scan-speed at 100 TB.",
    tags=("scalar", "date"),
)
def q_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderpriority", "o_orderdate", "o_orderkey")
    d0 = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast("long")
    spans = o.select(
        "o_orderpriority",
        d0.alias("d0"),
        (d0 + F.expr(_BIZ_SPAN_SQL)).alias("d1"),
    )
    counted = spans.select(
        "o_orderpriority",
        F.expr(
            _sql_weekdays_before("d1 + 1", "div") + " - " + _sql_weekdays_before("d0", "div")
        ).alias("biz_days"),
    )
    return (
        counted.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("biz_days").alias("sum_biz_days"),
            F.min("biz_days").alias("min_biz_days"),
            F.max("biz_days").alias("max_biz_days"),
            (F.sum("biz_days").cast("double") / F.count("*").cast("double")).alias(
                "avg_biz_days"
            ),
        )
        .orderBy("o_orderpriority")
    )
