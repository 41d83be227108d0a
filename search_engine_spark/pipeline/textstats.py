"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure column expressions (SQL-twin-able)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.pipeline.hashing import MERSENNE31
from search_engine_spark.tokenize import Tokenizer, WHITESPACE_TOKENIZER

# Tiny per-language token profiles (n-gram-heuristic stand-in; a real
# pipeline swaps in fastText/CLD — the operator shape is identical).
LANG_PROFILES: dict[str, list[str]] = {
    "en": "the a of and to in is for on with query table".split(),
    "de": "der die das und zu ein ist mit von nicht".split(),
    "fr": "le la les et de un est pour dans une".split(),
    "es": "el la los y de un es para en una".split(),
}

STOPWORDS_EN = frozenset(
    "the a an of and to in is are was for on with as by at it this that".split()
)

# BPE-ish pretokenizer: word pieces OR single non-space symbols (the classic
# GPT-2-style contraction-less split, public regex family)
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace token count + BPE-ish piece count + char count."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), 0))
    return docs.select(
        F.col(id_col).cast("long").alias("id"),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
        F.length(t).cast("long").alias("n_chars"),
    )


def quality_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic quality features + a combined score:
    mean token length, punctuation ratio, stopword ratio, length score.
    (The Gopher/C4-style filter family, as one select.)"""
    t = F.col(text_col)
    # materialize the token array first (see dedup.shingle_keys note)
    base = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != "").alias("_toks"),
        F.length(t).cast("long").alias("_n_chars"),
        F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0)).cast("long").alias("_n_punct"),
    )
    toks = F.col("_toks")
    n_tok = F.size(toks)
    n_chars = F.col("_n_chars")
    n_punct = F.col("_n_punct")
    stops = F.array(*[F.lit(s) for s in sorted(STOPWORDS_EN)])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stops, x)))
    mean_tok_len = F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0)
    len_score = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    quality = (
        len_score
        * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * 4))
        * (F.lit(0.5) + F.least(F.lit(0.5), stop_ratio))
    )
    return base.select(
        "id",
        n_tok.cast("long").alias("n_tokens"),
        mean_tok_len.cast("double").alias("mean_token_len"),
        punct_ratio.cast("double").alias("punct_ratio"),
        stop_ratio.cast("double").alias("stopword_ratio"),
        quality.cast("double").alias("quality"),
    )


def lang_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    profiles: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Profile-hit language ID: per language, count tokens in its profile;
    winner = max hits (ties -> lexicographically first language, 'und' when
    zero hits everywhere)."""
    profiles = profiles or LANG_PROFILES
    base = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("_toks"),
    )
    toks = F.col("_toks")
    hit_cols = {}
    for lang, words in sorted(profiles.items()):
        arr = F.array(*[F.lit(w) for w in sorted(words)])
        hit_cols[lang] = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
    out = base.select(
        "id",
        *[c.cast("long").alias(f"hits_{lang}") for lang, c in hit_cols.items()],
    )
    best = F.lit("und")
    best_n = F.lit(0).cast("long")
    for lang in sorted(profiles, reverse=True):  # earlier lang wins ties
        c = F.col(f"hits_{lang}")
        cond = (c > best_n) | ((c == best_n) & (c > 0))
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, c).otherwise(best_n)
    return out.select("id", *[f"hits_{lang}" for lang in sorted(profiles)],
                      best.alias("lang_pred"))


def doc_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    tokenizer: Tokenizer = WHITESPACE_TOKENIZER,
) -> DataFrame:
    """Order-sensitive rolling fingerprint of the token stream:
    fp = foldl (h·131 + char_poly(token)) mod M — a portable content id
    robust to whitespace normalization (vs sha256 of raw bytes)."""
    from search_engine_spark.pipeline.hashing import char_poly_hash_col

    base = docs.select(
        F.col(id_col).cast("long").alias("id"),
        tokenizer.tokens_col(F.col(text_col)).alias("_toks"),
    )
    # 1-arg lambda on purpose: see dedup.shingle_keys note (2-arg callables
    # get the element index bound to their second parameter)
    fp = F.aggregate(
        F.transform(F.col("_toks"), lambda t: char_poly_hash_col(t)),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 131 + h) % MERSENNE31,
    )
    return base.select("id", fp.alias("fingerprint"))
