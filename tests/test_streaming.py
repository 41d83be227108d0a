"""Structured-Streaming ingest (streaming/ingest.py): segments streamed in
micro-batches + one finalize produce the same QUERY-VISIBLE index as the
one-shot batch build (term/doc/corpus stats and ranked output keyed by
external id — internal docids may differ by arrival order), the file-source
checkpoint makes re-runs incremental (second drain ingests only files that
arrived after the first), and batch replay is idempotent (same batch id →
same docid base, overwrite of only its own segment directory).

The reference is strictly batch (SURVEY.md §2.12) — this surface is the
Spark-native extension for a corpus that keeps arriving.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import BM25, INDRI, ModelConfig
from search_engine_spark.corpus import code_corpus_df, with_docids
from search_engine_spark.engine.runner import Engine
from search_engine_spark.index.persist import (
    BuildConfig,
    Manifest,
    PackedIndex,
    build_persistent_index,
)
from search_engine_spark.streaming.ingest import (
    finalize_stream_index,
    ingest_batch,
    stream_ingest,
)
from search_engine_spark.tokenize import CODE_TOKENIZER

N_FILES, SEED = 90, 7


def _cfg(out: str) -> BuildConfig:
    return BuildConfig(
        out_dir=out, n_buckets=4, block_size=16, salt_threshold=40,
        n_salts=4, fields={"body": "content"}, tokenizer=CODE_TOKENIZER,
    )


def _doclens_by_ext(idx: PackedIndex):
    return {
        (r["ext_docid"], r["field"]): r["doclen"]
        for r in idx.doc_stats.join(idx.doc_ids, "docid")
        .select("ext_docid", "field", "doclen")
        .collect()
    }


def _term_stats(idx: PackedIndex):
    return {
        (r["term"], r["field"]): (r["df"], r["ctf"])
        for r in idx.term_stats.collect()
    }


@pytest.fixture(scope="module")
def streamed_vs_batch(spark, tmp_path_factory):
    """Stream the corpus in two arrival waves (checkpointed drains), finalize,
    and batch-build the same corpus; return both PackedIndexes + the dirs."""
    root = tmp_path_factory.mktemp("stream")
    arrivals = str(root / "arrivals")
    docs = code_corpus_df(spark, N_FILES, SEED).cache()
    wave1 = docs.where(F.crc32(F.col("path")) % 3 != 0)
    wave2 = docs.where(F.crc32(F.col("path")) % 3 == 0)
    assert wave1.count() > 0 and wave2.count() > 0

    cfg = _cfg(str(root / "sidx"))
    # wave 1 lands, stream drains it (1 file per micro-batch -> several
    # batches exercising the docid-base chaining)
    wave1.repartition(3).write.mode("append").parquet(arrivals)
    stream_ingest(spark, arrivals, cfg, max_files_per_trigger=1)
    # wave 2 arrives later; a fresh drain picks up ONLY the new files
    wave2.repartition(2).write.mode("append").parquet(arrivals)
    stream_ingest(spark, arrivals, cfg, max_files_per_trigger=1)

    man = Manifest(os.path.join(cfg.out_dir, "manifest.json"))
    n_batches_after_two_drains = len(man.data["stream"]["batches"])
    # a third drain with no new arrivals must ingest nothing
    stream_ingest(spark, arrivals, cfg)
    man = Manifest(os.path.join(cfg.out_dir, "manifest.json"))
    assert len(man.data["stream"]["batches"]) == n_batches_after_two_drains
    assert sum(
        b["n_docs"] for b in man.data["stream"]["batches"].values()
    ) == docs.count()

    finalize_stream_index(spark, cfg)

    bcfg = _cfg(str(root / "bidx"))
    build_persistent_index(spark, with_docids(docs), bcfg)

    return PackedIndex(spark, cfg.out_dir), PackedIndex(spark, bcfg.out_dir), cfg


def test_stream_equals_batch_stats(streamed_vs_batch):
    sidx, bidx, _ = streamed_vs_batch
    assert sidx.corpus.n_docs == bidx.corpus.n_docs
    assert sidx.corpus.by_field == bidx.corpus.by_field
    assert _term_stats(sidx) == _term_stats(bidx)
    assert _doclens_by_ext(sidx) == _doclens_by_ext(bidx)


def test_stream_equals_batch_ranking(streamed_vs_batch):
    sidx, bidx, _ = streamed_vs_batch
    for model, q in [
        (BM25, "lock free queue"),
        (BM25, "#SUM(ring buffer slot)"),
        (INDRI, "#WAND(0.7 lock 0.2 free 0.1 queue)"),
    ]:
        se = Engine(sidx, ModelConfig(name=model), tokenizer=CODE_TOKENIZER)
        be = Engine(bidx, ModelConfig(name=model), tokenizer=CODE_TOKENIZER)
        a = [
            (r["rank"], r["ext_docid"], r["score"])
            for r in se.search(q, 30).collect()
        ]
        b = [
            (r["rank"], r["ext_docid"], r["score"])
            for r in be.search(q, 30).collect()
        ]
        assert a == b, (model, q)


def test_stream_into_finalized_index_refused(spark, streamed_vs_batch):
    _, _, cfg = streamed_vs_batch
    docs = code_corpus_df(spark, 5, 11)
    with pytest.raises(RuntimeError, match="finalized"):
        ingest_batch(docs, 99, cfg)


def test_stream_config_drift_refused(spark, tmp_path_factory):
    """Drains with a different BuildConfig against the same out_dir must be
    refused (they would write incompatibly-bucketed/tokenized segments that
    finalize would silently stamp with the last config)."""
    root = tmp_path_factory.mktemp("drift")
    docs = code_corpus_df(spark, 10, 5)
    cfg = _cfg(str(root / "idx"))
    ingest_batch(docs, 0, cfg)
    from search_engine_spark.index.persist import BuildConfig

    bad = BuildConfig(**{**cfg.__dict__, "n_buckets": cfg.n_buckets * 2})
    with pytest.raises(ValueError, match="config mismatch"):
        ingest_batch(docs, 1, bad)
    with pytest.raises(ValueError, match="config differs"):
        finalize_stream_index(spark, bad)
    finalize_stream_index(spark, cfg)  # the recorded config still finalizes


def test_stream_into_partial_batch_build_refused(spark, tmp_path_factory):
    """segments/ with a bucket=*/ (batch-build) layout and no stream state
    means a crashed batch build — streaming batch=*/ dirs next to it would
    poison partition discovery at finalize."""
    root = tmp_path_factory.mktemp("partial")
    cfg = _cfg(str(root / "idx"))
    os.makedirs(os.path.join(cfg.out_dir, "segments", "bucket=0"))
    docs = code_corpus_df(spark, 5, 5)
    with pytest.raises(RuntimeError, match="partial batch build"):
        ingest_batch(docs, 0, cfg)


def test_batch_replay_is_idempotent(spark, tmp_path_factory):
    """Replaying a recorded micro-batch (crash between segment write and
    checkpoint commit) reuses its docid base and overwrites only its own
    directory — the finalized index is identical to the batch build's
    query surface."""
    root = tmp_path_factory.mktemp("replay")
    docs = code_corpus_df(spark, 40, 3).cache()
    b0 = docs.where(F.crc32(F.col("path")) % 2 == 0)
    b1 = docs.where(F.crc32(F.col("path")) % 2 != 0)

    cfg = _cfg(str(root / "sidx"))
    ingest_batch(b0, 0, cfg)
    ingest_batch(b1, 1, cfg)
    man_once = Manifest(os.path.join(cfg.out_dir, "manifest.json")).data["stream"]
    ingest_batch(b1, 1, cfg)  # replay the last batch
    man_twice = Manifest(os.path.join(cfg.out_dir, "manifest.json")).data["stream"]
    assert man_once["batches"] == man_twice["batches"]
    assert man_once["next_docid_base"] == man_twice["next_docid_base"]
    finalize_stream_index(spark, cfg)

    bcfg = _cfg(str(root / "bidx"))
    build_persistent_index(spark, with_docids(docs), bcfg)
    sidx, bidx = PackedIndex(spark, cfg.out_dir), PackedIndex(spark, bcfg.out_dir)
    assert _term_stats(sidx) == _term_stats(bidx)
    assert _doclens_by_ext(sidx) == _doclens_by_ext(bidx)
