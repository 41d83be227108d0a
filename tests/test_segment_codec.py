"""Segment parquet codec knob (BuildConfig.segment_codec / env
SPARK_GRAFT_SEGMENT_CODEC): segments are write-once read-once, so the codec
only trades segment-stage compress CPU against merge-stage scan bytes — the
PACKED index it produces must be byte-for-byte the same logical content, and
queries over it bit-identical."""

import glob
import os

import pyarrow.parquet as pq

from search_engine_spark.config import BM25, INDRI, ModelConfig
from search_engine_spark.engine.runner import Engine
from search_engine_spark.index.persist import (
    BuildConfig,
    PackedIndex,
    build_persistent_index,
)
from search_engine_spark.tokenize import CODE_TOKENIZER

QUERIES = [
    (BM25, "#SUM(ring buffer slot)"),
    (BM25, "lock free queue"),
    (INDRI, "#WAND(0.7 lock 0.2 free 0.1 queue)"),
]


def _build(spark, code_docs, tmp_path, codec):
    out = str(tmp_path / f"idx_{codec}")
    cfg = BuildConfig(
        out_dir=out, n_buckets=4, block_size=16, salt_threshold=40, n_salts=4,
        fields={"body": "content"}, tokenizer=CODE_TOKENIZER,
        segment_codec=codec,
    )
    build_persistent_index(spark, code_docs, cfg)
    return out


def test_zstd_segments_build_bitidentical_index(spark, code_docs, tmp_path):
    out_snappy = _build(spark, code_docs, tmp_path, "snappy")
    out_zstd = _build(spark, code_docs, tmp_path, "zstd")

    # the knob actually reached the segment files
    for out, want in [(out_snappy, "SNAPPY"), (out_zstd, "ZSTD")]:
        segs = glob.glob(os.path.join(out, "segments", "terms-*.parquet"))
        assert segs, out
        md = pq.ParquetFile(segs[0]).metadata
        assert md.row_group(0).column(0).compression == want

    # packed index content is unaffected: identical rows, identical bytes
    a = PackedIndex(spark, out_snappy)
    b = PackedIndex(spark, out_zstd)
    cols = ["term", "field", "salt", "block_id", "n",
            "docids", "tfs", "doclens", "positions"]
    pa_rows = sorted(map(tuple, a.packed.select(*cols).collect()))
    pb_rows = sorted(map(tuple, b.packed.select(*cols).collect()))
    assert pa_rows == pb_rows

    # and queries over it are bit-identical
    for model, q in QUERIES:
        ea = Engine(a, ModelConfig(name=model), tokenizer=CODE_TOKENIZER)
        eb = Engine(b, ModelConfig(name=model), tokenizer=CODE_TOKENIZER)
        ra = [(r["rank"], r["docid"], r["score"]) for r in ea.search(q, 30).collect()]
        rb = [(r["rank"], r["docid"], r["score"]) for r in eb.search(q, 30).collect()]
        assert ra == rb, (model, q)


def test_env_default_reaches_build_config(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SEGMENT_CODEC", "zstd")
    assert BuildConfig(out_dir="/tmp/x").segment_codec == "zstd"
    monkeypatch.delenv("SPARK_GRAFT_SEGMENT_CODEC")
    assert BuildConfig(out_dir="/tmp/x").segment_codec == "snappy"
