"""Multimodal plumbing: schemas, batch shapes, deterministic stub kernels."""

import hashlib

from search_engine_spark.pipeline import multimodal as mm


def test_media_table_schema(spark):
    df = mm.synth_media_df(spark, 12)
    assert df.schema == mm.MEDIA_SCHEMA
    kinds = {r["kind"] for r in df.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_image_features_deterministic(spark):
    df = mm.synth_media_df(spark, 12)
    feats = {r["media_id"]: list(r["feat"]) for r in mm.image_features(df, 8).collect()}
    images = {r["media_id"]: bytes(r["payload"])
              for r in df.where("kind = 'image'").collect()}
    assert set(feats) == set(images)
    for mid, payload in images.items():
        expect = [float(x) for x in mm._stable_floats(payload, 8)]
        import numpy as np

        assert np.allclose(feats[mid], expect, atol=1e-7)
        assert len(feats[mid]) == 8


def test_resize_shapes(spark):
    df = mm.synth_media_df(spark, 9)
    out = mm.resize_images(df, 32, 24).collect()
    assert out and all(r["width"] == 32 and r["height"] == 24 for r in out)


def test_frame_sampling(spark):
    df = mm.synth_media_df(spark, 12)
    frames = mm.sample_frames(df, every_ms=500).collect()
    vids = {r["media_id"]: (int(r["duration_ms"]), bytes(r["payload"]))
            for r in df.where("kind = 'video'").collect()}
    got = {}
    for r in frames:
        got.setdefault(r["media_id"], []).append((r["frame_idx"], r["ts_ms"]))
        want = hashlib.sha256(
            vids[r["media_id"]][1] + int(r["ts_ms"]).to_bytes(8, "little")
        ).digest()
        assert bytes(r["payload"]) == want
    for mid, (dur, _) in vids.items():
        assert [t for _, t in sorted(got[mid])] == list(range(0, dur, 500))


def test_media_stats(spark):
    df = mm.synth_media_df(spark, 12)
    stats = {r["kind"]: r["n"] for r in mm.media_stats(df).collect()}
    assert sum(stats.values()) == 12
