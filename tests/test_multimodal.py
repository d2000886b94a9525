"""Multimodal plumbing tests (decode is a deterministic fake — the
container has no media libraries; the Spark-side schema/batching is
what's under test)."""

import pytest
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.pipeline import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytes([10, 20, 30]) * 100),
        (2, "image", bytes([1, 2, 3]) * 50),
        (3, "audio", bytes([7, 7, 7]) * 200),
        (4, "image", None),
    ]
    return spark.createDataFrame(rows, "media_id long, kind string, payload binary")


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"abc")
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"abc")


def test_fake_decode_deterministic():
    a = M.decode_image(b"same-bytes", codec="fake")
    b = M.decode_image(b"same-bytes", codec="fake")
    assert (a == b).all()
    c = M.decode_image(b"other-bytes", codec="fake")
    assert (a != c).any()
    assert a.shape == (M.FEATURE_DIM,)


def test_extract_features(media):
    out = {r.media_id: r for r in M.extract_features(media, codec="fake").collect()}
    assert len(out) == 4
    assert out[1].n_bytes == 300
    assert len(out[1].features) == M.FEATURE_DIM
    assert out[4].features is None and out[4].n_bytes == 0
    assert out[3].kind == "audio"
    # determinism across runs
    again = {r.media_id: r for r in M.extract_features(media, codec="fake").collect()}
    assert again[1].features == out[1].features


def test_media_metadata_no_payload(media):
    out = M.media_metadata(media)
    assert "payload" not in out.columns
    rows = {r.media_id: r for r in out.collect()}
    assert rows[1].n_bytes == 300
    assert isinstance(rows[1].content_hash, int)


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, 91), (2, 10)], "media_id long, n_frames long")
    out = M.frame_sample_plan(df, every_n=30).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    assert by_id[1] == [0, 30, 60, 90]
    assert by_id[2] == [0]
