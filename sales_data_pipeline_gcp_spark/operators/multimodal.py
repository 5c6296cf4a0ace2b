"""Multimodal columns (SURVEY.md §2.4): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched Pandas
UDFs (``mapInPandas``).

The container has no image/audio codecs, so the DECODE step is a
deterministic fake (documented stub): features are derived from the raw
bytes themselves. Everything around it — binary column synthesis, metadata
struct schema, mapInPandas batch iteration, output schema, partitioning —
is the real plumbing a production decode would use: swap ``_fake_decode``
for a PIL/ffmpeg call and nothing else changes.

``q_multimodal_features`` is ORACLED despite the Pandas UDF: the payload is
``unhex(md5(text))``, so DuckDB can recompute every byte from the hex
string — the comparison proves the Python batch path computes exactly what
the declarative spec says.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.plans.registry import register

PAYLOAD_BYTES = 16  # md5 digest length
N_FEATURES = 4
FRAME_STRIDE = 32
VIDEO_REPEAT = 8

FEATURE_SCHEMA = (
    "doc_id bigint, format string, n_bytes int, feat array<double>, mean_byte double"
)
FRAME_SCHEMA = "doc_id bigint, n_frames int, frames array<binary>, frame_len array<int>"


def multimodal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload binary, meta struct): the canonical
    multimodal layout — opaque bytes + typed metadata. Payload is
    unhex(md5(text)) so tests/oracles can recompute it."""
    d = load(spark, sf_dir, "documents")
    fmt = F.when(F.col("doc_id") % 3 == 0, "png").when(F.col("doc_id") % 3 == 1, "jpeg").otherwise("webp")
    return d.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        F.struct(
            fmt.alias("format"),
            (F.col("doc_id") % 64 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 48 + 1).cast("int").alias("height"),
        ).alias("meta"),
    )


def _real_decode(payload: bytes, fmt: str):  # pragma: no cover - no codecs in image
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image codecs not available in this environment; production "
            "deployments plug PIL/ffmpeg in here — the Spark-side plumbing "
            "(schema, batching, partitioning) is identical"
        ) from exc


def _fake_decode(payload: bytes) -> tuple[list[float], float]:
    """Deterministic stand-in for a codec: first-N byte values as features
    plus the mean byte. Pure function of the bytes."""
    feats = [float(b) for b in payload[:N_FEATURES]]
    mean = sum(payload) / len(payload)
    return feats, mean


def decode_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': mapInPandas over (payload, meta). Each batch
    arrives as a pandas DataFrame; output schema is fixed and typed. At
    scale, batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
    so executor memory stays flat regardless of blob sizes."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [m["format"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feat": [d[0] for d in decoded],
                    "mean_byte": [d[1] for d in decoded],
                }
            )

    return mm.mapInPandas(op, schema=FEATURE_SCHEMA)


def _sql_byte(hex_expr: str, i: int) -> str:
    """i-th byte (0-based) of an md5 hex string as BIGINT."""
    return f"(('0x' || substring({hex_expr}, {2 * i + 1}, 2))::BIGINT)"


def _sql_mean_byte(hex_expr: str) -> str:
    terms = " + ".join(_sql_byte(hex_expr, i) for i in range(PAYLOAD_BYTES))
    return f"CAST({terms} AS DOUBLE) / {PAYLOAD_BYTES}"


@register(
    "q_multimodal_features",
    oracle=f"""
    WITH mm AS (SELECT doc_id, md5(text) AS hx FROM documents)
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'png'
                WHEN doc_id % 3 = 1 THEN 'jpeg'
                ELSE 'webp' END AS format,
           CAST({PAYLOAD_BYTES} AS INTEGER) AS n_bytes,
           array_to_string([{', '.join(f'CAST({_sql_byte("hx", i)} AS VARCHAR)' for i in range(N_FEATURES))}], ',') AS feat_csv,
           {_sql_mean_byte('hx')} AS mean_byte
    FROM mm
    """,
    doc="Multimodal decode/feature-extract: binary payload + metadata "
    "struct through an Arrow-batched mapInPandas (deterministic fake codec "
    "— see module docstring). Oracled byte-for-byte: DuckDB recomputes the "
    "features from the md5 hex, proving the Python batch path equals the "
    "declarative spec. The feature vector is serialized to an exact "
    "comma-joined integer string (byte values are integral doubles) — "
    "declared outputs carry no raw array cells (driver canonicalizer "
    "limitation); ``decode_features`` remains the array-returning library "
    "operator.",
    tags=("multimodal",),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = multimodal_table(spark, sf_dir)
    feats = decode_features(mm)
    feat_csv = F.array_join(
        F.transform("feat", lambda x: x.cast("bigint").cast("string")), ","
    )
    return feats.select(
        "doc_id",
        "format",
        F.col("n_bytes").cast("int").alias("n_bytes"),
        feat_csv.alias("feat_csv"),
        "mean_byte",
    )


def frame_sample(mm: DataFrame) -> DataFrame:
    """'Video' frame sampling: replicate the payload into a longer blob and
    cut fixed-stride frames — the shape of a real frame sampler (variable-
    length binary in, array<binary> out) with a deterministic fake source."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            videos = [bytes(p) * VIDEO_REPEAT for p in pdf["payload"]]
            frames = [
                [v[i * FRAME_STRIDE : (i + 1) * FRAME_STRIDE] for i in range(len(v) // FRAME_STRIDE)]
                for v in videos
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": [len(fs) for fs in frames],
                    "frames": frames,
                    "frame_len": [[len(f) for f in fs] for fs in frames],
                }
            )

    return mm.mapInPandas(op, schema=FRAME_SCHEMA)


#: hex chars per frame (FRAME_STRIDE bytes) and per replicated video.
_FRAME_HEX = FRAME_STRIDE * 2
_N_FRAMES = PAYLOAD_BYTES * VIDEO_REPEAT // FRAME_STRIDE


@register(
    "q_multimodal_framesample",
    oracle=f"""
    WITH mm AS (SELECT doc_id, repeat(md5(text), {VIDEO_REPEAT}) AS vid_hex
                FROM documents)
    SELECT doc_id,
           CAST({_N_FRAMES} AS INTEGER) AS n_frames,
           array_to_string(list_transform(range({_N_FRAMES}),
               i -> substring(vid_hex, i * {_FRAME_HEX} + 1, {_FRAME_HEX})), ',') AS frames_hex,
           array_to_string(list_transform(range({_N_FRAMES}),
               i -> CAST({FRAME_STRIDE} AS VARCHAR)), ',')                        AS frame_len_csv
    FROM mm
    """,
    doc="Video-style frame sampling: binary blob -> array<binary> frames at "
    "a fixed stride via mapInPandas. PROMOTED to a full oracle in round 2: "
    "the fake video is unhex(md5(text)) repeated, so DuckDB reconstructs "
    "every frame as a hex substring of repeat(md5(text), k) — the Python "
    "slicing path is held to the declarative spec byte-for-byte. Frames are "
    "serialized as comma-joined lowercase hex (no raw binary-array cells in "
    "declared output); ``frame_sample`` remains the array-returning library "
    "operator.",
    tags=("multimodal",),
)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    fr = frame_sample(multimodal_table(spark, sf_dir))
    return fr.select(
        "doc_id",
        "n_frames",
        F.array_join(F.transform("frames", lambda f: F.lower(F.hex(f))), ",").alias("frames_hex"),
        F.array_join(F.transform("frame_len", lambda x: x.cast("string")), ",").alias("frame_len_csv"),
    )
