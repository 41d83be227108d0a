"""The tokenizer invariant: JVM column expression ≡ Python twin ≡ pandas UDF
(SURVEY.md §1.4 — doc and query sides must share lexical processing exactly)."""

from pyspark.sql import functions as F

from search_engine_spark.tokenize import CODE_TOKENIZER, WHITESPACE_TOKENIZER


def test_jvm_equals_python(spark, code_docs):
    sample = code_docs.limit(40)
    jvm = sample.select(
        "docid", CODE_TOKENIZER.tokens_col(F.col("content")).alias("toks")
    ).collect()
    py = {
        r["docid"]: CODE_TOKENIZER.tokenize(r["content"])
        for r in sample.select("docid", "content").collect()
    }
    for r in jvm:
        assert list(r["toks"]) == py[r["docid"]]


def test_pandas_udf_equals_python(spark, code_docs):
    sample = code_docs.limit(20)
    udf_rows = sample.select(
        "docid", CODE_TOKENIZER.tokens_pandas_udf()(F.col("content")).alias("toks")
    ).collect()
    py = {
        r["docid"]: CODE_TOKENIZER.tokenize(r["content"])
        for r in sample.select("docid", "content").collect()
    }
    for r in udf_rows:
        assert list(r["toks"]) == py[r["docid"]]


def test_stopwords_and_punct():
    toks = CODE_TOKENIZER.tokenize("def merge_sort(xs): return sorted(xs)")
    assert "def" not in toks and "return" not in toks
    assert toks == ["merge_sort", "xs", "sorted", "xs"]


def test_whitespace_tokenizer_empty_and_none():
    assert WHITESPACE_TOKENIZER.tokenize(None) == []
    assert WHITESPACE_TOKENIZER.tokenize("   ") == []
