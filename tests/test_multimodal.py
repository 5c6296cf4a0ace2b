"""Pins the multimodal plumbing the driver only row-checks: frame sampling
content and the real container-header codecs."""

from __future__ import annotations

import hashlib

import pytest

from sales_data_pipeline_gcp_spark.operators.multimodal import (
    FRAME_STRIDE,
    PAYLOAD_BYTES,
    VIDEO_REPEAT,
    _HEADER_BYTES,
    decode_header,
    decode_headers,
    encode_jpeg_header,
    encode_png_header,
    encode_webp_header,
    frame_sample,
    image_table,
    multimodal_table,
)


def test_frame_sample_values(spark, sf_dir):
    mm = multimodal_table(spark, sf_dir)
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50).collect()
    }
    got = {r.doc_id: r for r in frame_sample(mm).filter("doc_id < 50").collect()}
    assert set(got) == set(texts)
    n_frames = PAYLOAD_BYTES * VIDEO_REPEAT // FRAME_STRIDE
    for doc_id, text in texts.items():
        video = hashlib.md5(text.encode()).digest() * VIDEO_REPEAT
        expected = [video[i * FRAME_STRIDE : (i + 1) * FRAME_STRIDE] for i in range(n_frames)]
        r = got[doc_id]
        assert r.n_frames == n_frames
        assert [bytes(f) for f in r.frames] == expected
        assert r.frame_len == [FRAME_STRIDE] * n_frames


@pytest.mark.parametrize(
    "enc,fmt",
    [
        (encode_png_header, "png"),
        (encode_jpeg_header, "jpeg"),
        (encode_webp_header, "webp"),
    ],
)
def test_header_codec_round_trip(enc, fmt):
    for w, h in [(1, 1), (64, 48), (37, 23), (640, 480), (16384, 16384)]:
        payload = enc(w, h)
        assert len(payload) == _HEADER_BYTES[fmt]
        assert decode_header(payload) == (fmt, w, h)


def test_decode_header_rejects_unknown_container():
    with pytest.raises(ValueError):
        decode_header(b"\x00" * 16)


def test_decode_header_jpeg_standalone_markers_and_fill_bytes():
    """Real-world JPEGs may pad markers with 0xFF fill bytes and emit
    length-less standalone markers (TEM 0x01, RST0-7) before SOF — none of
    which carry a seg_len (round-4 ADVICE). The walk must skip them
    instead of reading garbage lengths."""
    import struct

    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 480, 640, 1) + b"\x01\x11\x00"
    # SOI, fill bytes, TEM, RST0, RST7, more fill, then SOF0
    payload = b"\xff\xd8" + b"\xff\xff" + b"\xff\x01" + b"\xff\xd0" + b"\xff\xd7" + b"\xff\xff\xff" + sof0
    assert decode_header(payload) == ("jpeg", 640, 480)


def test_decode_header_jpeg_eoi_without_sof_rejected():
    payload = b"\xff\xd8" + b"\xff\xd9"  # SOI then EOI, no SOF
    with pytest.raises(ValueError):
        decode_header(payload)


def test_decode_headers_spark_round_trip(spark, sf_dir):
    rows = decode_headers(image_table(spark, sf_dir)).filter("doc_id < 60").collect()
    assert len(rows) == 60
    for r in rows:
        fmt = ["png", "jpeg", "webp"][r.doc_id % 3]
        assert (r.format, r.width, r.height) == (fmt, r.doc_id % 64 + 1, r.doc_id % 48 + 1)
        assert r.n_bytes == _HEADER_BYTES[fmt]
