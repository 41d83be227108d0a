"""Multimodal: schemas, batch shapes, and REAL decode — PNG codec roundtrip
(all five filters), image grid features from decoded pixels, WAV audio stats
via stdlib wave, corrupt-payload per-row fallback."""

import hashlib
import io
import struct
import wave
import zlib

import numpy as np
import pytest

from search_engine_spark.pipeline import multimodal as mm
from search_engine_spark.pipeline.png import decode_png, encode_png


def test_media_table_schema(spark):
    df = mm.synth_media_df(spark, 12)
    assert df.schema == mm.MEDIA_SCHEMA
    kinds = {r["kind"] for r in df.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


# ---------------------------------------------------------------------------
# PNG codec (public spec, stdlib)
# ---------------------------------------------------------------------------


def test_png_roundtrip_rgb_and_gray():
    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, size=(23, 31, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    gray = rng.integers(0, 256, size=(9, 14), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(gray)), gray)


def _encode_with_filter(arr: np.ndarray, f: int) -> bytes:
    """Hand-rolled single-filter PNG (RGB) to exercise the decoder's
    Sub/Up/Average/Paeth reconstruction paths."""
    h, w, _ = arr.shape
    ch = 3
    stride = w * ch
    prev = np.zeros(stride, dtype=np.int64)
    raw = b""
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int64)
        out = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 1:
                out[x] = (line[x] - a) & 0xFF
            elif f == 2:
                out[x] = (line[x] - b) & 0xFF
            elif f == 3:
                out[x] = (line[x] - (a + b) // 2) & 0xFF
            else:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = (line[x] - pred) & 0xFF
        raw += bytes([f]) + out.astype(np.uint8).tobytes()
        prev = line
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


@pytest.mark.parametrize("f", [1, 2, 3, 4])
def test_png_decode_all_filters(f):
    rng = np.random.default_rng(f)
    arr = rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(_encode_with_filter(arr, f)), arr)


# ---------------------------------------------------------------------------
# image features / resize (real decode)
# ---------------------------------------------------------------------------


def test_image_features_from_decoded_pixels(spark):
    df = mm.synth_media_df(spark, 12)
    feats = {
        r["media_id"]: (list(r["feat"]), r["decoded"])
        for r in mm.image_features(df, 8).collect()
    }
    images = {r["media_id"]: bytes(r["payload"])
              for r in df.where("kind = 'image'").collect()}
    assert set(feats) == set(images)
    for mid, payload in images.items():
        got, decoded = feats[mid]
        assert decoded is True
        expect = mm.grid_mean_features(decode_png(payload), 8)
        assert np.allclose(got, expect, atol=1e-6)
        assert len(got) == 8


def test_image_features_corrupt_fallback(spark):
    rows = [(1, "image", "image/png", b"not a png at all", 8, 8, None)]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    (r,) = mm.image_features(df, 6).collect()
    assert r["decoded"] is False
    assert np.allclose(list(r["feat"]), mm._stable_floats(b"not a png at all", 6), atol=1e-7)


def test_resize_real_roundtrip(spark):
    df = mm.synth_media_df(spark, 9)
    out = mm.resize_images(df, 32, 24).collect()
    assert out
    for r in out:
        assert r["width"] == 32 and r["height"] == 24
        img = decode_png(bytes(r["payload"]))
        assert img.shape == (24, 32, 3)


# ---------------------------------------------------------------------------
# audio features (stdlib wave decode)
# ---------------------------------------------------------------------------


def test_audio_features_real_wav(spark):
    df = mm.synth_media_df(spark, 12)
    stats = {r["media_id"]: r for r in mm.audio_features(df).collect()}
    auds = {r["media_id"]: (bytes(r["payload"]), int(r["duration_ms"]))
            for r in df.where("kind = 'audio'").collect()}
    assert set(stats) == set(auds)
    for mid, (payload, dur) in auds.items():
        r = stats[mid]
        assert r["decoded"] is True
        with wave.open(io.BytesIO(payload), "rb") as wf:
            pcm = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2").astype(np.float64)
            assert r["framerate"] == wf.getframerate()
        assert r["n_samples"] == len(pcm) == mm._AUDIO_RATE * dur // 1000
        assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(pcm**2))))
        assert 0.0 < r["zero_cross_rate"] < 1.0


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


def test_extract_frame_ffmpeg_paths(tmp_path):
    """The subprocess frame extractor: success passes stdout through,
    nonzero exit / missing binary fall back to None (-> digest stand-in)."""
    good = tmp_path / "fake_ffmpeg"
    good.write_text("#!/bin/sh\nprintf 'PNGDATA'\n")
    good.chmod(0o755)
    assert mm._extract_frame_ffmpeg(str(good), b"xx", 500) == b"PNGDATA"

    bad = tmp_path / "fail_ffmpeg"
    bad.write_text("#!/bin/sh\nexit 1\n")
    bad.chmod(0o755)
    assert mm._extract_frame_ffmpeg(str(bad), b"xx", 500) is None

    assert mm._extract_frame_ffmpeg(str(tmp_path / "missing"), b"xx", 0) is None
