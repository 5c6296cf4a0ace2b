"""Pins the multimodal plumbing the driver only row-checks: frame sampling
content and the stub behavior for real codecs."""

from __future__ import annotations

import hashlib

import pytest

from sales_data_pipeline_gcp_spark.operators.multimodal import (
    FRAME_STRIDE,
    PAYLOAD_BYTES,
    VIDEO_REPEAT,
    _real_decode,
    frame_sample,
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


def test_real_decode_is_marked_stub():
    with pytest.raises(NotImplementedError):
        _real_decode(b"\x00" * 16, "png")
