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

# Lucene's default English stopword set (EnglishAnalyzer.ENGLISH_STOP_WORDS_SET,
# the one the reference's StopFilter uses via
# hw5/QryEval/EnglishAnalyzerConfigurable.java:137-160) — 33 words, public.
ENGLISH_STOPWORDS: frozenset[str] = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

_APOSTROPHES = "'’ʼ"  # ASCII ', right single quote, modifier letter


@dataclass(frozen=True)
class Tokenizer:
    """split on `split_pattern` -> lowercase -> [possessive strip] ->
    drop empties -> drop stopwords -> [stem].

    ``possessive``/``stemmer`` extend the pipeline to the reference's English
    analyzer shape (StandardTokenizer -> EnglishPossessiveFilter -> LowerCase
    -> Stop -> stem, hw5/QryEval/EnglishAnalyzerConfigurable.java:137-160).
    Both default OFF: the default tokenizers are bit-identical to the
    pre-analyzer behavior, and only the Python / Arrow-kernel paths support
    them (``tokens_col`` raises — a stemmer is not a JVM Column expression).
    The reference stems with Krovetz (KSTEM), a dictionary stemmer whose
    lexicon isn't publicly redistributable; ``stemmer='porter'`` substitutes
    the fully-public Porter algorithm (search_engine_spark/porter.py) and the
    rank-identity contract still holds because documents and queries share
    this one object.
    """

    name: str = "whitespace"
    split_pattern: str = r"\s+"
    lowercase: bool = True
    stopwords: frozenset[str] = field(default_factory=frozenset)
    possessive: bool = False  # strip trailing 's + enclosing apostrophes
    stemmer: str | None = None  # None | "porter"

    @property
    def transforms_vocab(self) -> bool:
        """True when per-term string transforms (possessive strip / stemming)
        apply — the vectorized index kernel then rewrites + re-unifies the
        per-chunk vocabulary (index/persist.py) instead of using the raw
        dictionary codes."""
        return self.possessive or self.stemmer is not None

    def term_normalize(self, t: str) -> str:
        """Pre-stopword per-term rewrite: strip enclosing apostrophes (the
        UAX#29 word-break approximation — apostrophes survive only between
        letters) then one trailing possessive ``'s``/``’s`` (Lucene's
        EnglishPossessiveFilter). Identity when ``possessive`` is False."""
        if not self.possessive:
            return t
        t = t.strip(_APOSTROPHES)
        if len(t) >= 2 and t[-1] == "s" and t[-2] in _APOSTROPHES:
            t = t[:-2]
        return t

    def term_stem(self, t: str) -> str:
        """Post-stopword per-term rewrite. Identity unless ``stemmer`` set."""
        if self.stemmer is None:
            return t
        if self.stemmer == "porter":
            from search_engine_spark.porter import porter_stem_cached

            return porter_stem_cached(t)
        raise ValueError(f"unknown stemmer: {self.stemmer!r}")

    # ---- Python twin (queries, oracle) ----
    def tokenize(self, text: str) -> list[str]:
        if text is None:
            return []
        if self.lowercase:
            text = text.lower()
        toks = re.split(self.split_pattern, text)
        if not self.transforms_vocab:
            # pre-analyzer fast path, kept verbatim (bitwise contract)
            return [t for t in toks if t and t not in self.stopwords]
        normed = (self.term_normalize(t) for t in toks)
        return [
            self.term_stem(t) for t in normed if t and t not in self.stopwords
        ]

    # ---- JVM Column expression (index-build hot path) ----
    def tokens_col(self, col: Column) -> Column:
        if self.transforms_vocab:
            raise NotImplementedError(
                "possessive/stemmer analyzers have no JVM Column twin — use "
                "tokens_pandas_udf() or the Arrow index kernel"
            )
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

# The reference's analyzer family (§1.4), Porter standing in for Krovetz (see
# class docstring). Split keeps apostrophes so the possessive filter sees
# them; the class is ASCII+apostrophe on both the Python-re and RE2 engines.
ENGLISH_TOKENIZER = Tokenizer(
    name="english",
    split_pattern=rf"[^0-9A-Za-z{_APOSTROPHES}]+",
    lowercase=True,
    stopwords=ENGLISH_STOPWORDS,
    possessive=True,
    stemmer="porter",
)

# name -> tokenizer: the index manifest records `tokenizer.name` in its
# config echo (index/persist.py _config_echo), so a query session can resolve
# the exact analyzer an index was built with — doc and query sides must share
# it (§1.4 invariant).
TOKENIZERS: dict[str, Tokenizer] = {
    t.name: t for t in (WHITESPACE_TOKENIZER, CODE_TOKENIZER, ENGLISH_TOKENIZER)
}


def tokenizer_by_name(name: str) -> Tokenizer:
    try:
        return TOKENIZERS[name]
    except KeyError:
        raise ValueError(
            f"unknown analyzer {name!r}; available: {sorted(TOKENIZERS)}"
        ) from None
