"""Multimodal plumbing stages (mapInPandas, stub codecs): decode,
resize, frame-sample, feature-extract — schemas, batch shapes, and
NotImplementedError gates for the real codecs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from yamon_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "a" * 640), (2, "hello world " * 40), (3, "x")], "doc_id bigint, text string"
    )
    return M.attach_binary(docs)


def test_decode_media(spark, media):
    rows = {r.doc_id: r for r in M.decode_media(media).collect()}
    assert rows[1].n_bytes == 640
    assert rows[1].width == 640 % 640 and rows[1].n_frames == 640 % 30
    assert len(rows[1].sha) == 64
    assert rows[3].n_bytes == 1


def test_resize_media(spark, media):
    rows = M.resize_media(media, 224, 224).collect()
    assert all(r.width == 224 and r.height == 224 for r in rows)
    assert all(isinstance(r.payload, (bytes, bytearray)) for r in rows)


def test_sample_frames_expansion(spark, media):
    rows = M.sample_frames(media, every_n=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    # doc 1: 640 bytes -> 10 frames -> sampled 0,2,4,6,8
    assert by_doc[1] == [0, 2, 4, 6, 8]
    assert by_doc[3] == [0]  # tiny payload still yields one frame


def test_extract_features(spark, media):
    rows = {r.doc_id: r.feature for r in M.extract_features(media, dim=8).collect()}
    assert all(len(v) == 8 for v in rows.values())
    assert all(0.0 <= x <= 1.0 for v in rows.values() for x in v)
    # deterministic: same input -> same features
    again = {r.doc_id: r.feature for r in M.extract_features(media, dim=8).collect()}
    assert rows == again


def test_real_codec_gates(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|PIL|pyav|model"):
        M.resize_media(media, decode_stub=False).collect()
