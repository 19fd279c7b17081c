"""Multimodal plumbing tests: binary columns, typed metadata, stubbed
decode via mapInPandas (deterministic fake path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frames_map_reduce_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [(1, b"\x89PNG fake image bytes one"),
            (2, b"\x89PNG fake image bytes two"),
            (3, b"\x89PNG fake image bytes one")]  # same payload as 1
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_attach_media_meta(media):
    out = MM.attach_media_meta(media, "payload", "image/png")
    row = out.filter(F.col("doc_id") == 1).first()
    assert row["media_meta"]["mime"] == "image/png"
    assert row["media_meta"]["n_bytes"] == 25
    assert row["media_meta"]["width"] is None


def test_decode_fake_features_deterministic(media):
    out = MM.decode_image_features(media, "doc_id", "payload", fake=True)
    rows = {r["doc_id"]: r["feature"] for r in out.collect()}
    assert len(rows[1]) == MM.FEATURE_DIM
    assert rows[1] == rows[3]      # same bytes ⇒ same vector
    assert rows[1] != rows[2]
    again = {r["doc_id"]: r["feature"]
             for r in MM.decode_image_features(media, "doc_id", "payload", fake=True).collect()}
    assert again == rows           # deterministic across runs


def test_decode_real_path_raises(media):
    with pytest.raises(Exception) as exc_info:
        MM.decode_image_features(media, "doc_id", "payload", fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError)


def test_sample_frames_fake(media):
    out = MM.sample_frames(media, "doc_id", "payload", every_ms=1000, fake=True)
    rows = out.collect()
    assert len(rows) == 9  # 3 docs × 3 frames at 1s cadence over fake 3s
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2] for v in per_doc.values())


def test_resize_plumbing(media):
    out = MM.resize_images(media, "doc_id", "payload", 64, 64, fake=True)
    rows = out.collect()
    assert len(rows) == 3
    for r in rows:
        assert r["media_meta"]["width"] == 64
        assert r["media_meta"]["n_bytes"] == len(r["payload"])


def test_audio_features(media):
    rows = MM.extract_audio_features(media, "doc_id", "payload", fake=True).collect()
    by_id = {r["doc_id"]: r["feature"] for r in rows}
    assert by_id[1] == by_id[3] and by_id[1] != by_id[2]


def test_features_to_similarity_pipeline(spark, media):
    """End-to-end multimodal pipeline: binary → features → exact near-dup
    via the similarity operators (docs 1 and 3 share bytes ⇒ cosine 1)."""
    from frames_map_reduce_spark.operators.similarity import embedding_near_dup_pairs
    feats = MM.decode_image_features(media, "doc_id", "payload", fake=True) \
              .withColumnRenamed("doc_id", "vec_id") \
              .withColumnRenamed("feature", "embedding")
    pairs = embedding_near_dup_pairs(feats, threshold=0.999,
                                     dim=MM.FEATURE_DIM, n_planes=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 3)}
