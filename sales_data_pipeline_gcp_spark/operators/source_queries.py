"""Source-format coverage (SURVEY.md §2.3 sources/sinks): explicit-schema
CSV scan (the reference's only source, scripts/process_sales.py:25-35) and
JSON scan.

Round 2: both scans are FULLY ORACLED. The scan fixtures are deterministic
(seeded generator / literal rows) and written to a FIXED path at module
import — registry loading imports this module before either engine runs, so
DuckDB reads the same bytes via ``read_csv``/``read_json`` by absolute path.

Cross-engine notes baked into the oracles:

- CSV: DuckDB's default ``nullstr`` treats empty fields as NULL, matching
  Spark's PERMISSIVE empty->NULL; explicit column types both sides (schema
  inference double-reads the data at scale and is never used).
- JSON: Spark PERMISSIVE with an explicit schema keeps PARTIAL results on a
  type-mismatched record (id: "not-an-int" -> id NULL, kind kept). DuckDB
  mirrors that per-field nulling by reading every column as VARCHAR and
  ``TRY_CAST``-ing — verified cell-identical including the float64-from-NULL
  dtype.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from sales_data_pipeline_gcp_spark.io import read_json, read_sales_csv
from sales_data_pipeline_gcp_spark.plans.registry import register

#: Per-user fixture directory (created 0700): a fixed world-readable /tmp
#: name could be pre-created or symlinked by another local user, and two
#: concurrent runs of different users would race on the same files.
FIXTURE_DIR = os.path.join(
    tempfile.gettempdir(),
    f"spark_graft_scan_fixtures_{getattr(os, 'getuid', lambda: 'u')()}",
)
CSV_PATH = os.path.join(FIXTURE_DIR, "sales_scan_seed21.csv")
JSON_PATH = os.path.join(FIXTURE_DIR, "events_scan.jsonl")
CSV_ROWS = 200
CSV_SEED = 21
JSON_ROWS = 100


def _install(path: str, content: bytes) -> None:
    """Atomically install ``content`` at ``path``: skip when the on-disk
    bytes already match (so a concurrent DuckDB oracle read of the same
    absolute path never observes a truncated rewrite), else write to a
    temp name and os.rename into place (atomic on POSIX)."""
    try:
        with open(path, "rb") as f:
            if f.read() == content:
                return
    except OSError:
        pass
    fd, tmp = tempfile.mkstemp(dir=FIXTURE_DIR, prefix=os.path.basename(path) + ".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(content)
        os.rename(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def ensure_scan_fixtures() -> None:
    """Materialize the deterministic scan fixtures (idempotent, atomic;
    called lazily from the query functions — no import-time I/O)."""
    from sales_data_pipeline_gcp_spark.sources.sales import generate_rows, write_csv

    os.makedirs(FIXTURE_DIR, mode=0o700, exist_ok=True)

    csv_tmp = os.path.join(FIXTURE_DIR, f"__gen-{os.getpid()}.csv")
    write_csv(csv_tmp, generate_rows(CSV_ROWS, seed=CSV_SEED))
    try:
        with open(csv_tmp, "rb") as f:
            csv_bytes = f.read()
    finally:
        os.unlink(csv_tmp)
    _install(CSV_PATH, csv_bytes)

    lines = [
        json.dumps({"id": i, "kind": "k" + str(i % 3), "score": i / 10.0}) + "\n"
        for i in range(JSON_ROWS)
    ]
    lines.append('{"id": "not-an-int", "kind": "bad"}\n')  # malformed -> partial NULLs
    _install(JSON_PATH, "".join(lines).encode())


# The oracle SQL embeds these absolute paths and the harness may execute
# the DuckDB side before the Spark query function runs, so the fixtures
# must exist as soon as the registry is importable. With the content-match
# skip this is one small read per import, not a rewrite.
ensure_scan_fixtures()

_CSV_COLUMNS = (
    "{'product': 'VARCHAR', 'price': 'DOUBLE', 'quantity': 'INTEGER', "
    "'total': 'DOUBLE', 'ordered_at': 'TIMESTAMP', 'delivery_at': 'TIMESTAMP'}"
)


@register(
    "q_scan_csv_schema",
    oracle=f"""
    WITH raw AS (
        SELECT * FROM read_csv('{CSV_PATH}', header = true, columns = {_CSV_COLUMNS})
    ), kept AS (
        SELECT * FROM raw
        WHERE NOT (quantity IS NULL AND price IS NULL AND total IS NULL)
    ), q_imputed AS (
        SELECT product, price,
               CASE WHEN quantity IS NULL THEN CAST(FLOOR(total / price) AS BIGINT)
                    ELSE CAST(quantity AS BIGINT) END AS quantity,
               total, ordered_at, delivery_at
        FROM kept
    ), t_imputed AS (
        SELECT product, price, quantity,
               CASE WHEN total IS NULL THEN ROUND(price * quantity, 2)
                    ELSE total END AS total,
               ordered_at, delivery_at
        FROM q_imputed
    )
    SELECT product,
           CAST(price AS REAL)       AS price,
           CAST(quantity AS INTEGER) AS quantity,
           CAST(total AS REAL)       AS total,
           ordered_at,
           delivery_at
    FROM t_imputed
    """,
    doc="Header-aware CSV scan with the reference's explicit StructType "
    "(no inference — inference double-reads the data at scale), PERMISSIVE "
    "malformed->NULL handling, then the reference cleaning pipeline. "
    "Fully oracled in round 2: the fixture CSV lives at a fixed path and "
    "DuckDB replays scan + cleaning (all-null drop, sequential impute, "
    "narrowing casts) on the same bytes.",
    tags=("source",),
)
def q_scan_csv_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sales_data_pipeline_gcp_spark.cleaning import clean_sales

    ensure_scan_fixtures()
    return clean_sales(read_sales_csv(spark, CSV_PATH), audit=False)


# ---------------------------------------------------------------------------
# partition-pruned scans (round 5)
# ---------------------------------------------------------------------------

#: Hive-partitioned parquet fixture: the seeded sales rows laid out as
#: ``sales_by_month/sale_month=M/part-0.parquet``. Written with pyarrow at
#: import time (the oracle may run before any SparkSession exists), one
#: file per partition, fully deterministic. The ENGINE's partitioned sink
#: (io.write_append(partition_by=...)) produces the same layout — proven
#: equivalent in tests/test_sources.py::test_write_append_partitioned_layout.
PART_DIR = os.path.join(FIXTURE_DIR, "sales_by_month")
PART_ROWS = 2000
PART_SEED = 33
PRUNE_MONTHS = (3, 4)


def _partition_files() -> dict[int, bytes]:
    """month -> deterministic parquet bytes for that partition's rows."""
    import io as _io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sales_data_pipeline_gcp_spark.sources.sales import generate_rows

    by_month: dict[int, list[dict]] = {}
    for r in generate_rows(PART_ROWS, seed=PART_SEED):
        by_month.setdefault(r["ordered_at"].month, []).append(r)
    out: dict[int, bytes] = {}
    for m, rs in sorted(by_month.items()):
        table = pa.table(
            {
                "product": pa.array([r["product"] for r in rs], pa.string()),
                "price": pa.array([r["price"] for r in rs], pa.float64()),
                "quantity": pa.array([r["quantity"] for r in rs], pa.int32()),
                "total": pa.array([r["total"] for r in rs], pa.float64()),
                "ordered_date": pa.array(
                    [r["ordered_at"].date() for r in rs], pa.date32()
                ),
            }
        )
        buf = _io.BytesIO()
        pq.write_table(table, buf)
        out[m] = buf.getvalue()
    return out


def ensure_partitioned_fixture() -> None:
    """Materialize the hive-partitioned fixture (idempotent, atomic)."""
    os.makedirs(FIXTURE_DIR, mode=0o700, exist_ok=True)
    for m, content in _partition_files().items():
        d = os.path.join(PART_DIR, f"sale_month={m}")
        os.makedirs(d, exist_ok=True)
        _install(os.path.join(d, "part-0.parquet"), content)


ensure_partitioned_fixture()

_PART_GLOB = f"{PART_DIR}/*/*.parquet"


@register(
    "q_scan_pruned",
    oracle=f"""
    SELECT CAST(sale_month AS INTEGER) AS sale_month,
           product,
           COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(total AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) AS sum_total
    FROM read_parquet('{_PART_GLOB}', hive_partitioning = true)
    WHERE CAST(sale_month AS INTEGER) IN {PRUNE_MONTHS}
      AND total IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="Partition-PRUNED scan over a hive-partitioned table "
    "(sale_month=M/ directories): the predicate on the partition column "
    "is resolved against directory names at PLANNING time, so only the "
    f"{len(PRUNE_MONTHS)} matching partitions are ever listed or read — "
    "at 100 TB this is the first scale lever a user pulls (scan cost "
    "proportional to data matched, not data stored). The plan assertion "
    "(tests/test_plans.py) pins PartitionFilters non-empty on the scan "
    "node, and tests/test_sources.py proves via input_file_name() that "
    "only matching partition directories are touched. Data-layer analog "
    "of the reference's control-plane routing filter "
    "(scripts/main.py:21-23). Oracled via DuckDB's hive_partitioning "
    "read of the same directory tree.",
    tags=("source", "layout"),
)
def q_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ensure_partitioned_fixture()
    df = spark.read.parquet(PART_DIR)
    return (
        df.filter(F.col("sale_month").cast("int").isin(*PRUNE_MONTHS))
        .filter(F.col("total").isNotNull())
        .groupBy(
            F.col("sale_month").cast("int").alias("sale_month"), "product"
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("total").cast("decimal(38,2)")).cast("string").cast("double").alias("sum_total"),
        )
    )


#: month -> fiscal quarter dim for the dynamic-pruning demo. The filter
#: lands on ``quarter`` — a column the FACT does not have, so static
#: pruning can't apply and only a runtime filter derived from the joined
#: dim rows can prune fact partitions.
_QUARTER = "Q2"
_DIM_MONTHS = tuple((m, f"Q{(m - 1) // 3 + 1}") for m in range(1, 13))
_DIM_SQL = ", ".join(f"({m}, '{q}')" for m, q in _DIM_MONTHS)


@register(
    "q_join_dpp",
    oracle=f"""
    WITH dim(month, quarter) AS (VALUES {_DIM_SQL}),
    fact AS (
        SELECT CAST(sale_month AS INTEGER) AS sale_month, total
        FROM read_parquet('{_PART_GLOB}', hive_partitioning = true)
    )
    SELECT f.sale_month,
           d.quarter,
           COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(f.total AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) AS sum_total
    FROM fact f
    JOIN dim d ON f.sale_month = d.month
    WHERE d.quarter = '{_QUARTER}'
    GROUP BY 1, 2
    """,
    doc="DYNAMIC partition pruning: the selective filter sits on the dim "
    "side (quarter, a column the partitioned fact lacks), so the planner "
    "cannot prune statically — instead Catalyst injects a "
    "DynamicPruningExpression into the fact scan's PartitionFilters, "
    "fed by the broadcast dim's join keys at RUNTIME (plan assertion in "
    "tests/test_plans.py). At 100 TB this is how a 'revenue for fiscal "
    "Q2' query over a date-partitioned fact reads 3 months instead of "
    "the full table. Complements q_scan_pruned (static) and "
    "q_bloom_prefilter (row-level runtime filter).",
    tags=("source", "layout"),
)
def q_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ensure_partitioned_fixture()
    fact = spark.read.parquet(PART_DIR).select(
        F.col("sale_month").cast("int").alias("sale_month"), "total"
    )
    dim = spark.createDataFrame(list(_DIM_MONTHS), "month int, quarter string")
    return (
        fact.join(
            F.broadcast(dim.filter(F.col("quarter") == _QUARTER)),
            fact.sale_month == F.col("month"),
        )
        .groupBy("sale_month", "quarter")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("total").cast("decimal(38,2)")).cast("string").cast("double").alias("sum_total"),
        )
    )


@register(
    "q_scan_json",
    oracle=f"""
    SELECT TRY_CAST(id AS BIGINT)    AS id,
           kind,
           TRY_CAST(score AS DOUBLE) AS score
    FROM read_json('{JSON_PATH}',
                   columns = {{'id': 'VARCHAR', 'kind': 'VARCHAR', 'score': 'VARCHAR'}},
                   format = 'newline_delimited')
    """,
    doc="JSON-lines scan with explicit schema (scale path: schema declared, "
    "single pass, malformed records -> per-field NULLs). Fully oracled in "
    "round 2: DuckDB reads every field as VARCHAR and TRY_CASTs, which "
    "mirrors Spark PERMISSIVE partial-result semantics cell-for-cell.",
    tags=("source",),
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    ensure_scan_fixtures()
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    return read_json(spark, JSON_PATH, schema)


# --- ORC source ------------------------------------------------------------

ORC_PATH = os.path.join(FIXTURE_DIR, "sales_scan_seed27.orc")
ORC_TWIN_PATH = os.path.join(FIXTURE_DIR, "sales_scan_seed27_twin.parquet")
ORC_ROWS = 300
ORC_SEED = 27


def _orc_fixture_bytes() -> tuple[bytes, bytes]:
    """One pyarrow table serialized twice: once as ORC (read by Spark's
    ORC source — the format under test) and once as parquet (read by the
    DuckDB oracle, which has no ORC reader). Same in-memory table, so the
    two files are logically identical by construction."""
    import io as _io

    import pyarrow as pa
    import pyarrow.orc as pa_orc
    import pyarrow.parquet as pq

    from sales_data_pipeline_gcp_spark.sources.sales import generate_rows

    rs = list(generate_rows(ORC_ROWS, seed=ORC_SEED))
    table = pa.table(
        {
            "product": pa.array([r["product"] for r in rs], pa.string()),
            "price": pa.array([r["price"] for r in rs], pa.float64()),
            "quantity": pa.array([r["quantity"] for r in rs], pa.int32()),
            "total": pa.array([r["total"] for r in rs], pa.float64()),
        }
    )
    ob, pb = _io.BytesIO(), _io.BytesIO()
    pa_orc.write_table(table, ob)
    pq.write_table(table, pb)
    return ob.getvalue(), pb.getvalue()


def ensure_orc_fixture() -> None:
    os.makedirs(FIXTURE_DIR, mode=0o700, exist_ok=True)
    orc_bytes, twin_bytes = _orc_fixture_bytes()
    _install(ORC_PATH, orc_bytes)
    _install(ORC_TWIN_PATH, twin_bytes)


ensure_orc_fixture()


@register(
    "q_scan_orc",
    oracle=f"""
    SELECT product,
           COUNT(*) AS n_rows,
           COUNT(total) AS n_total,
           CAST(CAST(SUM(CAST(total AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) AS sum_total,
           CAST(SUM(CAST(quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM read_parquet('{ORC_TWIN_PATH}')
    GROUP BY product
    """,
    doc="ORC scan (Spark's second columnar format, reference had CSV-only "
    "sources): the fixture is ONE pyarrow table serialized as both ORC "
    "(Spark side — exercises the native vectorized ORC reader, predicate "
    "pushdown and column pruning included) and parquet (oracle side — "
    "DuckDB has no ORC reader, so the twin file from the same in-memory "
    "table is the equivalence witness). The aggregate projects 3 of 4 "
    "columns, so ReadSchema on the ORC scan shows column pruning exactly "
    "as on parquet. At 100 TB ORC vs parquet is a storage-layout choice, "
    "not a query-shape one — every declared query would run unchanged on "
    "an ORC lake.",
    tags=("source",),
)
def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ensure_orc_fixture()
    df = spark.read.orc(ORC_PATH)
    return df.groupBy("product").agg(
        F.count("*").alias("n_rows"),
        F.count("total").alias("n_total"),
        F.sum(F.col("total").cast("decimal(38,2)")).cast("string").cast("double").alias("sum_total"),
        F.sum(F.col("quantity").cast("bigint")).alias("sum_qty"),
    )


# --- schema evolution (mergeSchema read over heterogeneous batches) --------

EVOLVED_DIR = os.path.join(FIXTURE_DIR, "sales_evolved")
EVOLVED_V1_PATH = os.path.join(EVOLVED_DIR, "batch_v1.parquet")
EVOLVED_V2_PATH = os.path.join(EVOLVED_DIR, "batch_v2.parquet")
EVOLVED_V1_ROWS = 120
EVOLVED_V2_ROWS = 80


def _evolved_fixture_bytes() -> tuple[bytes, bytes]:
    """Two parquet batches with EVOLVED schemas in one directory: v1 is the
    legacy layout (id, amount); v2 adds a ``channel`` column mid-stream —
    the additive-column evolution every long-lived ingest pipeline hits.
    Values are deterministic dyadic fractions (i * 0.25) so the doubles
    are exact in both engines."""
    import io as _io

    import pyarrow as pa
    import pyarrow.parquet as pq

    v1 = pa.table(
        {
            "id": pa.array(range(EVOLVED_V1_ROWS), pa.int64()),
            "amount": pa.array([i * 0.25 for i in range(EVOLVED_V1_ROWS)], pa.float64()),
        }
    )
    chans = ("web", "app", "ads")
    v2 = pa.table(
        {
            "id": pa.array(
                range(EVOLVED_V1_ROWS, EVOLVED_V1_ROWS + EVOLVED_V2_ROWS), pa.int64()
            ),
            "amount": pa.array(
                [i * 0.25 for i in range(EVOLVED_V1_ROWS, EVOLVED_V1_ROWS + EVOLVED_V2_ROWS)],
                pa.float64(),
            ),
            "channel": pa.array(
                [chans[i % 3] for i in range(EVOLVED_V2_ROWS)], pa.string()
            ),
        }
    )
    b1, b2 = _io.BytesIO(), _io.BytesIO()
    pq.write_table(v1, b1)
    pq.write_table(v2, b2)
    return b1.getvalue(), b2.getvalue()


def ensure_evolved_fixture() -> None:
    os.makedirs(EVOLVED_DIR, mode=0o700, exist_ok=True)
    v1_bytes, v2_bytes = _evolved_fixture_bytes()
    # _install's tmp files land in FIXTURE_DIR; rename across the same fs.
    _install(EVOLVED_V1_PATH, v1_bytes)
    _install(EVOLVED_V2_PATH, v2_bytes)


ensure_evolved_fixture()


@register(
    "q_scan_evolved",
    oracle=f"""
    SELECT COALESCE(channel, 'legacy') AS channel,
           COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(amount AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE)
               AS total_amount,
           CAST(MIN(id) AS BIGINT) AS min_id,
           CAST(MAX(id) AS BIGINT) AS max_id
    FROM read_parquet(['{EVOLVED_V1_PATH}', '{EVOLVED_V2_PATH}'],
                      union_by_name = true)
    GROUP BY COALESCE(channel, 'legacy')
    """,
    doc="Schema-evolution scan: one table directory whose parquet batches "
    "disagree on schema (a ``channel`` column appeared mid-stream). "
    "Spark reads with ``mergeSchema=true`` — footers union at planning "
    "time, pre-evolution files surface the new column as NULL — and the "
    "aggregate folds those NULLs into a 'legacy' bucket; DuckDB mirrors "
    "with ``union_by_name``. This is the additive-evolution contract a "
    "100 TB lake depends on: no rewrite of old files, readers resolve "
    "by name. Scale note: mergeSchema footer-unioning reads every "
    "footer at planning — on a huge lake pin the merged schema in a "
    "catalog/metastore instead and pass it explicitly; the query shape "
    "is unchanged, which is the point.",
    tags=("source",),
)
def q_scan_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ensure_evolved_fixture()
    df = spark.read.option("mergeSchema", "true").parquet(EVOLVED_DIR)
    return df.groupBy(
        F.coalesce(F.col("channel"), F.lit("legacy")).alias("channel")
    ).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("amount").cast("decimal(38,2)"))
        .cast("string")
        .cast("double")
        .alias("total_amount"),
        F.min("id").cast("bigint").alias("min_id"),
        F.max("id").cast("bigint").alias("max_id"),
    )


# ---------------------------------------------------------------------------
# Python UDTF surface (Spark 4): one row in -> many rows out
# ---------------------------------------------------------------------------

#: UDTF chunker window (words per chunk; non-overlapping).
UDTF_CHUNK_WORDS = 20

_UDTF_CHUNKS_SQL = f"""
    WITH words AS (
        SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
        FROM documents
    ), idx AS (
        SELECT doc_id, ws,
               UNNEST(range(0, (len(ws) + {UDTF_CHUNK_WORDS - 1}) // {UDTF_CHUNK_WORDS})) AS k
        FROM words WHERE len(ws) > 0
    )
    SELECT doc_id,
           CAST(k AS INTEGER) AS chunk_idx,
           CAST(len(ws[{UDTF_CHUNK_WORDS}*k+1 : {UDTF_CHUNK_WORDS}*k+{UDTF_CHUNK_WORDS}])
                AS INTEGER) AS n_words,
           md5(array_to_string(
               ws[{UDTF_CHUNK_WORDS}*k+1 : {UDTF_CHUNK_WORDS}*k+{UDTF_CHUNK_WORDS}], ' '))
               AS chunk_md5
    FROM idx
"""


@register(
    "q_udtf_chunks",
    oracle=_UDTF_CHUNKS_SQL,
    doc=f"Python UDTF surface (Spark 4 user-defined TABLE function): a "
    f"lateral-joined generator that explodes each document into "
    f"{UDTF_CHUNK_WORDS}-word non-overlapping chunks with per-chunk md5 "
    "content fingerprints — one row in, many rows out, the API shape "
    "flatMap-style extensions (parsers, tokenizers, segmenters) need "
    "when the output cardinality is data-dependent. Completes the "
    "Python extension matrix: scalar pandas_udf (q_udf_vectorized), "
    "grouped applyInPandas (q_grouped_trend), mapInPandas (multimodal), "
    "applyInPandasWithState (streaming), and now UDTF. The oracle is "
    "the fully declarative DuckDB rewrite, which doubles as the "
    "guidance: like q_grouped_trend vs q_grouped_trend_sql, the "
    "built-in explode/slice form (q_text_chunk) is the 10x/100 TB "
    "path — a UDTF earns its per-row Python cost only when the "
    "generation logic cannot be expressed declaratively. At 100 TB: "
    "embarrassingly parallel per-row generation, no shuffle; the "
    "Python boundary is the documented cost.",
    tags=("udf", "text", "llm"),
)
def q_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from pyspark.sql.functions import udtf

    from sales_data_pipeline_gcp_spark.io import register_views

    @udtf(
        returnType="doc_id: bigint, chunk_idx: int, n_words: int, chunk_md5: string",
        useArrow=True,  # Arrow-batched boundary — the repo-wide lint bans
        # row-at-a-time BatchEvalPython in every plan, UDTFs included
    )
    class ChunkDocs:
        def eval(self, doc_id, text):  # noqa: ANN001 - UDTF signature
            words = [w for w in (text or "").split(" ") if w]
            for i in range(0, len(words), UDTF_CHUNK_WORDS):
                chunk = words[i : i + UDTF_CHUNK_WORDS]
                yield (
                    doc_id,
                    i // UDTF_CHUNK_WORDS,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    register_views(spark, sf_dir, ("documents",))
    spark.udtf.register("chunk_docs_udtf", ChunkDocs)
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.n_words, c.chunk_md5
        FROM documents AS d, LATERAL chunk_docs_udtf(d.doc_id, d.text) AS c
        """
    )


# ---------------------------------------------------------------------------
# adversarial CSV (RFC 4180 quoting) + raw text-line source
# ---------------------------------------------------------------------------

QUOTED_CSV_PATH = os.path.join(FIXTURE_DIR, "quoted_scan.csv")
TEXT_PATH = os.path.join(FIXTURE_DIR, "lines_scan.txt")

#: RFC 4180 torture rows: embedded delimiters, doubled-quote escapes,
#: embedded newlines (both \n and \r\n), unicode, and a QUOTED empty
#: string (which BOTH engines read as NULL — see the docstring).
_QUOTED_CSV = (
    "id,name,note,amount\n"
    "1,plain,unremarkable,1.5\n"
    '2,"comma, inside","double "" quote",2.25\n'
    '3,"line\nbreak","crlf\r\nbreak",3.75\n'
    '4,"ünïcødé ✓","tab\there",4.5\n'
    '5,"",final,0.25\n'
)

_TEXT_LINES = [
    "plain line",
    "comma, semicolon; tab\there",
    'quotes "stay" literal',
    "ünïcødé ✓ line",
    "  leading and trailing  ",
]


def ensure_quoted_fixtures() -> None:
    os.makedirs(FIXTURE_DIR, mode=0o700, exist_ok=True)
    _install(QUOTED_CSV_PATH, _QUOTED_CSV.encode())
    _install(TEXT_PATH, ("\n".join(_TEXT_LINES) + "\n").encode())


ensure_quoted_fixtures()


@register(
    "q_scan_csv_quoted",
    oracle=f"""
    SELECT id,
           name,
           note,
           amount,
           CAST(LENGTH(name) AS INTEGER) AS name_len,
           CAST(LENGTH(note) AS INTEGER) AS note_len
    FROM read_csv('{QUOTED_CSV_PATH}', header = true,
                  columns = {{'id': 'BIGINT', 'name': 'VARCHAR',
                             'note': 'VARCHAR', 'amount': 'DOUBLE'}})
    """,
    doc="RFC 4180 CSV conformance scan: embedded delimiters, doubled-quote "
    "escapes, embedded LF and CRLF newlines INSIDE quoted fields, "
    "unicode, and a quoted empty string — the torture cases that "
    "silently corrupt naive split(',') ingestion. Spark reads with "
    "multiLine + doubled-quote escape; byte lengths are emitted so "
    "content fidelity (not just row count) is adjudicated. Unquoted "
    "empty fields are deliberately ABSENT: Spark and DuckDB disagree on "
    "empty-vs-NULL for them, so the operator's contract documents "
    "quoted-empty as the portable empty-string spelling. At 100 TB: "
    "multiLine CSV cannot be split within a file (a quote can span any "
    "byte range), so the scale posture is many medium files — or "
    "re-encode to parquet at the edge, which every other query here "
    "assumes.",
    tags=("source",),
)
def q_scan_csv_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ensure_quoted_fixtures()
    df = (
        spark.read.schema("id bigint, name string, note string, amount double")
        .option("header", "true")
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(QUOTED_CSV_PATH)
    )
    return df.select(
        "id",
        "name",
        "note",
        "amount",
        F.length("name").cast("int").alias("name_len"),
        F.length("note").cast("int").alias("note_len"),
    )


@register(
    "q_scan_text",
    oracle=f"""
    SELECT value,
           CAST(LENGTH(value) AS INTEGER) AS n_chars,
           md5(value) AS line_md5
    FROM read_csv('{TEXT_PATH}', delim = '', header = false, quote = '',
                  columns = {{'value': 'VARCHAR'}})
    """,
    doc="Raw text-line source (spark.read.text): each physical line is one "
    "row, delimiters/quotes/whitespace preserved byte-for-byte — the "
    "ingestion shape for log files and LLM text corpora before any "
    "structure is imposed. Content fidelity is adjudicated via per-line "
    "length and md5. The DuckDB oracle reads the same file as an "
    "unquoted single-column CSV on a sentinel delimiter. At 100 TB: "
    "newline-delimited text splits cleanly at block boundaries (unlike "
    "multiLine CSV), so this source parallelizes to one task per split "
    "with zero coordination.",
    tags=("source", "text"),
)
def q_scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ensure_quoted_fixtures()
    return spark.read.text(TEXT_PATH).select(
        "value",
        F.length("value").cast("int").alias("n_chars"),
        F.md5("value").alias("line_md5"),
    )
