"""Multimodal plumbing: schema contract, Arrow-batched extraction, stubs."""

import pytest
from pyspark.sql import functions as F

from vscode_parquet_visualizer_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media_table(spark, n=24)


def test_media_schema(media):
    assert media.schema == mm.MEDIA_SCHEMA
    assert media.count() == 24


def test_extract_features_schema_and_determinism(media):
    out = mm.extract_features(media)
    assert out.schema == mm.FEATURE_SCHEMA
    a = {r["id"]: r["feature"] for r in out.collect()}
    b = {r["id"]: r["feature"] for r in mm.extract_features(media).collect()}
    assert a == b
    assert all(len(v) == 8 for v in a.values())
    # histogram features sum to ~1
    assert all(abs(sum(v) - 1.0) < 1e-3 for v in a.values())


def test_fake_decode_deterministic():
    payload = bytes(range(100))
    assert mm.deterministic_fake_decode(payload) == mm.deterministic_fake_decode(payload)
    assert mm.deterministic_fake_decode(None) == [0.0] * 8


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError, match="codec"):
        mm.real_decode_stub(b"\x00")


def test_resize_stub_raises(media):
    out = mm.resize_images(media.filter(F.col("media_type") == "image"), 32, 32)
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        out.collect()


def test_sample_frames_shape(media):
    out = mm.sample_frames(media, every_nth=1, max_frames=4)
    assert out.schema == mm.FRAME_SCHEMA
    rows = out.collect()
    assert len(rows) > 0
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r["frame_index"])
    for idxs in by_id.values():
        assert sorted(idxs) == list(range(len(idxs)))  # contiguous indices
        assert len(idxs) <= 4
    # only video rows produce frames
    video_ids = {r["id"] for r in media.filter("media_type = 'video'").collect()}
    assert set(by_id) <= video_ids
