"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partitioning-safe
batch shapes, Arrow-friendly mapInPandas kernels; the actual media DECODE is
stubbed (this container ships no image/audio libs). Each kernel:

- accepts/returns pandas DataFrames with explicit schemas (BinaryType for
  payloads, struct-ish flat columns for metadata),
- is deterministic: the "fake decode" derives features from a stable hash of
  the payload bytes, so tests pin exact values and a later swap-in of a real
  decoder (PIL/torchaudio/ffmpeg) changes ONLY the kernel body,
- never collects to the driver; batch size is bounded by
  spark.sql.execution.arrow.maxRecordsPerBatch.

Swap points are marked with `REAL DECODER HERE`.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("width", T.IntegerType(), True),   # typed metadata...
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
        T.StructField("feat_dim", T.IntegerType()),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def synth_media_df(spark, n: int = 32, seed: int = 5) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    import random

    rows = []
    for i in range(n):
        rng = random.Random(f"media:{seed}:{i}")
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.randrange(256) for _ in range(64 + (i % 5) * 32))
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                64 + (i % 4) * 16 if kind != "audio" else None,
                48 + (i % 3) * 16 if kind != "audio" else None,
                1000 * (1 + i % 7) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _stable_floats(payload: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-features from the payload digest."""
    out = []
    h = payload or b""
    while len(out) < dim:
        h = hashlib.sha256(h).digest()
        out.extend(b / 255.0 for b in h[:16])
    return [float(x) for x in out[:dim]]


def image_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Decode + embed images -> float feature vectors (batched)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            feats = [
                # REAL DECODER HERE: PIL.Image.open(BytesIO(p)) -> model
                _stable_floats(p, dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "feat": pd.Series(feats, dtype="object", index=pdf.index),
                    "feat_dim": pd.Series([dim] * len(pdf), dtype="int32", index=pdf.index),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, IMAGE_FEAT_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: payload passthrough + new dims (a real impl re-encodes)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            # REAL DECODER HERE: decode -> resize -> re-encode bytes
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": pdf["payload"],
                    "width": pd.Series([width] * len(pdf), dtype="int32", index=pdf.index),
                    "height": pd.Series([height] * len(pdf), dtype="int32", index=pdf.index),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, RESIZE_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sample stub for videos: one output row per sampled timestamp;
    payload = deterministic slice digest standing in for the frame bytes."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            pdf = pdf[(pdf["kind"] == "video") & pdf["duration_ms"].notna()]
            ids, idxs, tss, payloads = [], [], [], []
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                for j, ts in enumerate(range(0, int(dur), every_ms)):
                    ids.append(mid)
                    idxs.append(j)
                    tss.append(ts)
                    # REAL DECODER HERE: ffmpeg -ss ts -frames:v 1
                    payloads.append(
                        hashlib.sha256(bytes(payload) + ts.to_bytes(8, "little")).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return media.select("media_id", "kind", "duration_ms", "payload").mapInPandas(
        kernel, FRAME_SCHEMA
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind inventory (pure column ops — no Python)."""
    return media.groupBy("kind").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.length("payload")).cast("long").alias("total_bytes"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )
