"""Deterministic lexical pipeline shared by documents and queries.

The reference runs one analyzer (StandardTokenizer -> possessive -> lowercase
-> stopword -> Krovetz stem; hw5/QryEval/EnglishAnalyzerConfigurable.java:137-160,
applied to queries via QryEval.java:1298-1314) over BOTH document text (at
Lucene index time) and query terms — the invariant the whole system depends on
(hw1/QryEval/ReadMe.txt warns "Otherwise, you may get zero results").

We keep that invariant with a single Tokenizer definition exposing three
equivalent implementations:

- ``tokens_col(col)``     — a pure JVM Column expression (split/lower/filter):
                            the hot path at index build, whole-stage-codegen'd,
                            zero Python in the loop;
- ``tokenize(text)``      — the Python twin used driver-side for query strings
                            and by the pure-Python test oracle;
- ``tokens_pandas_udf()`` — an Arrow-vectorized pandas UDF variant, kept for
                            pipelines that need Python-only lexical steps
                            (e.g. a real stemmer); tested equal to the JVM path.

Stopwords are removed BEFORE positions are assigned (positions index the
post-filter token sequence, 0-based) and doclen counts post-filter tokens —
the contract every operator and the oracle share.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


# Language-keyword stoplist for source-code corpora (the analog of Lucene's
# English stopword set for the reference's web corpus).
CODE_STOPWORDS: frozenset[str] = frozenset(
    """def return import class public void private static final if else for
    while var let const func fn package end begin then do""".split()
)


@dataclass(frozen=True)
class Tokenizer:
    """split on `split_pattern` -> lowercase -> drop empties -> drop stopwords."""

    name: str = "whitespace"
    split_pattern: str = r"\s+"
    lowercase: bool = True
    stopwords: frozenset[str] = field(default_factory=frozenset)

    # ---- Python twin (queries, oracle) ----
    def tokenize(self, text: str) -> list[str]:
        if text is None:
            return []
        if self.lowercase:
            text = text.lower()
        toks = re.split(self.split_pattern, text)
        return [t for t in toks if t and t not in self.stopwords]

    # ---- JVM Column expression (index-build hot path) ----
    def tokens_col(self, col: Column) -> Column:
        c = F.lower(col) if self.lowercase else col
        arr = F.split(c, self.split_pattern)
        if self.stopwords:
            stops = F.lit(sorted(self.stopwords))
            pred = lambda x: (x != F.lit("")) & ~F.array_contains(stops, x)  # noqa: E731
        else:
            pred = lambda x: x != F.lit("")  # noqa: E731
        return F.filter(arr, pred)

    # ---- pyarrow.compute twin (segment-kernel hot path) ----
    def tokens_arrow(self, arr):
        """``pa.Array[str] -> pa.ListArray[str]`` of tokens BEFORE the
        empty/stopword filter (the filter happens code-side in the segment
        kernel, where dropped tokens also vacate their positions).

        Uses ``utf8_lower`` + ``split_pattern_regex`` (RE2) — equality with
        the Python twin ``tokenize`` is asserted in tests/test_corpus.py
        over the synthetic corpus and adversarial strings. RE2's ``\\s`` is
        ASCII-only while Python's is Unicode-aware, so the whitespace
        tokenizer's twin test covers unicode spaces; the code tokenizer's
        class ``[^0-9A-Za-z_]+`` is ASCII-negated on both engines."""
        import pyarrow.compute as pc

        if arr.null_count:
            arr = pc.fill_null(arr, "")
        if self.lowercase:
            arr = pc.utf8_lower(arr)
        return pc.split_pattern_regex(arr, self.split_pattern)

    # ---- Arrow-vectorized pandas UDF variant ----
    def tokens_pandas_udf(self):
        import pandas as pd  # noqa: F401
        from pyspark.sql import types as T

        tok = self  # capture the (picklable, frozen) dataclass, not SparkContext

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def _tokens(s):  # s: pd.Series[str]
            return s.map(tok.tokenize)

        return _tokens


WHITESPACE_TOKENIZER = Tokenizer()

CODE_TOKENIZER = Tokenizer(
    name="code",
    split_pattern=r"[^0-9A-Za-z_]+",
    lowercase=True,
    stopwords=CODE_STOPWORDS,
)
