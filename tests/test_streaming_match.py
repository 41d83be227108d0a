"""Prospective search (streaming/match.py): batch-matcher scores equal the
engine's BM25 #SUM scores on the same corpus+snapshot, and the streamed
matcher over arrival waves emits exactly the batch matcher's output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import BM25, ModelConfig
from search_engine_spark.corpus import code_corpus_df
from search_engine_spark.engine.runner import Engine
from search_engine_spark.streaming.match import (
    match_docs,
    query_term_table,
    read_matches,
    stream_matches,
)
from search_engine_spark.tokenize import CODE_TOKENIZER

QUERIES = [
    ("q1", "lock free queue"),
    ("q2", "ring buffer slot"),
    ("q3", "zzz_no_such_term queue"),  # unknown term drops, known term scores
]


def _by_ext(df):
    return {
        (r["qid"], r["ext_docid"]): r["score"] for r in df.collect()
    }


def test_match_scores_equal_engine_bm25_sum(spark, code_docs, code_index):
    qt = query_term_table(code_index, QUERIES, CODE_TOKENIZER)
    got = _by_ext(
        match_docs(code_docs, qt, code_index, tokenizer=CODE_TOKENIZER)
    )
    eng = Engine(code_index, ModelConfig(name=BM25), tokenizer=CODE_TOKENIZER)
    for qid, text in QUERIES:
        bow = " ".join(CODE_TOKENIZER.tokenize(text))
        want = {
            r["ext_docid"]: r["score"]
            for r in eng.scores(f"#SUM({bow})")
            .join(code_index.doc_ids, "docid")
            .select("ext_docid", "score")
            .collect()
            if r["score"] > 0.0
        }
        mine = {e: s for (q, e), s in got.items() if q == qid}
        assert mine.keys() == want.keys(), qid
        for e in want:
            assert mine[e] == pytest.approx(want[e], rel=1e-12, abs=1e-300), (
                qid, e,
            )


def test_stream_matches_equals_batch(spark, code_docs, code_index, tmp_path_factory):
    root = tmp_path_factory.mktemp("pmatch")
    arrivals, out = str(root / "arrivals"), str(root / "out")
    # arriving docs: a DIFFERENT deterministic corpus than the snapshot's —
    # the realistic prospective case (new docs scored with old stats)
    arriving = code_corpus_df(spark, 40, 99).cache()
    w1 = arriving.where(F.crc32("path") % 2 == 0)
    w2 = arriving.where(F.crc32("path") % 2 != 0)

    w1.repartition(2).write.mode("append").parquet(arrivals)
    stream_matches(
        spark, arrivals, code_index, QUERIES, out, CODE_TOKENIZER,
        max_files_per_trigger=1,
    )
    w2.repartition(2).write.mode("append").parquet(arrivals)
    stream_matches(spark, arrivals, code_index, QUERIES, out, CODE_TOKENIZER)

    qt = query_term_table(code_index, QUERIES, CODE_TOKENIZER)
    want = _by_ext(match_docs(arriving, qt, code_index, tokenizer=CODE_TOKENIZER))
    streamed = read_matches(spark, out)
    got = _by_ext(streamed)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k
    # every emitted match came from exactly one micro-batch
    assert streamed.groupBy("qid", "ext_docid").count().where(
        F.col("count") > 1
    ).count() == 0
