"""Multimodal plumbing: batch shapes, determinism of the stand-in
feature extractor, and frame-sample fanout arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawspark.operators.multimodal import (
    N_FRAMES,
    decode_media,
    extract_media_features,
    media_table,
)

SF = "/root/testdata/sf0.001"


def test_decode_media_schema_and_kinds(spark):
    meta = decode_media(media_table(spark, SF))
    rows = meta.collect()
    assert rows and set(meta.columns) == {
        "media_ref", "media_kind", "n_bytes", "width", "height",
        "duration_ms"}
    kinds = {r["media_kind"] for r in rows}
    assert kinds == {"image", "audio", "video"}
    for r in rows:
        assert (r["duration_ms"] > 0) == (r["media_kind"] == "video")
        assert r["width"] == 320  # payload always starts with 'B'


def test_features_deterministic_and_fixed_dim(spark):
    a = {r["media_ref"]: list(r["features"]) for r in
         extract_media_features(media_table(spark, SF)).collect()}
    b = {r["media_ref"]: list(r["features"]) for r in
         extract_media_features(media_table(spark, SF)).collect()}
    assert a == b and a
    assert all(len(v) == 16 for v in a.values())
    assert all(0.0 <= x < 1.0 for v in a.values() for x in v)


def test_frame_sample_fanout(spark):
    from crawspark.registry import load_all
    q = load_all()["multimodal_frame_sample"]
    rows = q.spark(spark, SF).collect()
    n_videos = (media_table(spark, SF)
                .filter(F.col("media_kind") == "video").count())
    assert len(rows) == n_videos * N_FRAMES
    by_ref: dict = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(
            (r["frame_idx"], r["frame_ms"]))
    for frames in by_ref.values():
        frames.sort()
        ms = [m for _, m in frames]
        assert ms == sorted(ms) and len(set(ms)) == N_FRAMES  # spaced
