"""Corpus determinism + the per-row sha256 content invariant (input_hint)."""

import hashlib

from pyspark.sql import functions as F

from search_engine_spark.corpus import generate_code_rows


def test_generator_deterministic():
    a = generate_code_rows(50, seed=7)
    b = generate_code_rows(50, seed=7)
    assert a == b
    c = generate_code_rows(50, seed=8)
    assert a != c


def test_schema_and_ids(code_docs):
    assert code_docs.columns == [
        "docid", "ext_docid", "repo", "path", "commit", "lang", "content",
        "content_sha256",
    ]
    n = code_docs.count()
    assert code_docs.select("docid").distinct().count() == n
    assert code_docs.select("ext_docid").distinct().count() == n
    # docids are the dense 1..N row numbers
    mm = code_docs.agg(F.min("docid"), F.max("docid")).first()
    assert (mm[0], mm[1]) == (1, n)


def test_content_sha256_invariant(code_docs):
    """Per-row invariant vs the source table: Spark's sha2(content, 256)
    equals hashlib.sha256 of the same content, row for row."""
    rows = code_docs.select("content", "content_sha256").collect()
    assert len(rows) > 0
    for r in rows:
        assert (
            hashlib.sha256(r["content"].encode("utf-8")).hexdigest()
            == r["content_sha256"]
        )
