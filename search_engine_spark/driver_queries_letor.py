"""Driver-contract queries for the LeToR surface (SURVEY.md §2.11) with full
DuckDB oracles.

Feature-source mapping onto the sf documents table (doc_id, text, lang,
source, n_chars), mirroring hw5/QryEval/FeatureVector.java's doc fields:

- f1 "spam score" (stored int field)   -> n_chars
- f2/f3 rawUrl                         -> a deterministic synthetic url
  derived from (source, lang, doc_id): every 5th doc is a wikipedia.org
  url (f3 flag varies), depth varies via a repeated '/x' suffix (f2)
- f4 pageRankFile                      -> synthetic ALL-NEGATIVE pageranks
  (like real log-pageranks) for EVEN doc_ids only: the odd docs exercise
  the missing-entry NaN path and the all-negative values exercise the
  Java Double.MIN_VALUE max-init normalization quirk
- field slots: body only (title/url/inlink absent -> NaN -> 0.0 after
  normalization, the absent-TermVector path)

Query: ``spark query table spark`` — the duplicate token exercises the
token-position semantics (Indri/overlap/f17/f18 count it twice; BM25's
doc-stem walk counts it once). Candidates = BM25 #SUM top-100 (the
reference's min(100, n) candidate cut, QryEval.java:424).

Floating-point contract with the oracle: every arithmetic expression is
written with IDENTICAL association on both engines (sums fold in sorted-
distinct order for BM25, query-token order elsewhere); the exported feature
columns and the rerank score are float32-rounded on BOTH sides to absorb
pow() 1-ulp libm differences, and the rerank orders by that rounded score
(ties broken by ascending docid) so both engines rank identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.config import BM25, BM25Params, IndriParams, ModelConfig
from search_engine_spark.engine.letor import (
    FEATURE_COLS,
    JAVA_DOUBLE_MAX,
    JAVA_DOUBLE_MIN,
    LetorConfig,
    classify_local,
    letor_features_local,
    normalize_features_local,
)
from search_engine_spark.engine.runner import Engine
from search_engine_spark.driver_queries import SQL_PRELUDE, load_documents_index

_B = BM25Params()
_I = IndriParams()

LETOR_QUERY = "spark query table spark"
QTOKENS = ["spark", "query", "table", "spark"]
DISTINCT = ["spark", "query", "table"]
QLEN = len(QTOKENS)

# fixed linear-model weights (the svm_rank_classify model-file analog)
WEIGHTS = [((j * 7) % 13 - 6) / 10.0 for j in range(1, 19)]

_CFG = LetorConfig(bm25=_B, indri=_I, fields4=("body", None, None, None))


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def _docs_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wiki = (F.col("doc_id") % 5) == 0
    url = F.when(
        wiki,
        F.concat(
            F.lit("https://en.wikipedia.org/"), F.col("source"),
            F.lit("/"), F.col("lang"),
        ),
    ).otherwise(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit("/"), F.col("lang"),
            F.expr("repeat('/x', CAST(doc_id % 3 AS INT))"),
        )
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("docid"),
        F.col("n_chars").cast("long").alias("n_chars"),
        url.alias("url"),
    )


def _pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.where((F.col("doc_id") % 2) == 0).select(
        F.col("doc_id").cast("long").alias("docid"),
        (
            F.lit(-1.0)
            - (F.col("doc_id") % 97).cast("double") / F.lit(97.0)
        ).alias("pagerank"),
    )


def _normalized_rows(spark: SparkSession, sf_dir: str) -> list[dict]:
    """Candidate search -> normalized feature rows via the single-query fast
    path (engine/letor.py letor_features_local — expression-identical to the
    distributed letor_features, parity-asserted in tests/test_letor.py)."""
    idx = load_documents_index(spark, sf_dir)
    eng = Engine(idx, ModelConfig(name=BM25))
    cands = [r["docid"] for r in eng.search(LETOR_QUERY, 100).collect()]
    raw = letor_features_local(
        spark, idx, QTOKENS, cands, _CFG,
        docs_meta=_docs_meta(spark, sf_dir), f1_col="n_chars", url_col="url",
        pagerank=_pagerank(spark, sf_dir),
    )
    return normalize_features_local(raw, _CFG.disable)


def q_letor_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    rows = _normalized_rows(spark, sf_dir)
    data = [
        tuple([r["docid"]] + [float(np.float32(r[c])) for c in FEATURE_COLS])
        for r in rows
    ]
    schema = "docid long, " + ", ".join(f"{c} double" for c in FEATURE_COLS)
    return spark.createDataFrame(data, schema)


def q_letor_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    rows = classify_local(_normalized_rows(spark, sf_dir), WEIGHTS)
    ranked = sorted(
        ((float(np.float32(r["score"])), r["docid"]) for r in rows),
        key=lambda sr: (-sr[0], sr[1]),
    )[:100]
    data = [(i + 1, d, s) for i, (s, d) in enumerate(ranked)]
    return spark.createDataFrame(data, "rank int, docid long, score double")


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------


def _sub(col: str, term: str) -> str:
    return f"(SELECT {col} FROM dfstats WHERE term = '{term}')"


def _cands_cte() -> str:
    """BM25 #SUM top-100 for the (duplicated-token) query: per-term f32
    scores, the duplicate term weighted x2 (exact doubling), sum, top-100."""
    return f"""
lscores AS (
  SELECT t.doc_id,
         CAST(CAST(
           greatest(0.0, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5)))
           * (t.tf / (t.tf + {_B.k1!r} * ({1.0 - _B.b!r} + {_B.b!r} * l.doclen / c.avgdl)))
         AS REAL) AS DOUBLE)
         * (CASE t.term WHEN 'spark' THEN 2.0 ELSE 1.0 END) AS score
  FROM tfs t JOIN dfstats d USING (term) JOIN dl l USING (doc_id)
  CROSS JOIN consts c
  WHERE t.term IN ('spark', 'query', 'table')
),
lagg AS (SELECT doc_id, sum(score) AS score FROM lscores GROUP BY 1),
cand AS (
  SELECT doc_id AS docid FROM lagg
  ORDER BY score DESC, doc_id ASC LIMIT 100
)"""


def _meta_cte() -> str:
    return """
docmeta AS (
  SELECT doc_id AS docid, CAST(n_chars AS DOUBLE) AS n_chars,
         CASE WHEN doc_id % 5 = 0
              THEN 'https://en.wikipedia.org/' || source || '/' || lang
              ELSE 'https://' || source || '/' || lang ||
                   repeat('/x', CAST(doc_id % 3 AS INT))
         END AS url,
         CASE WHEN doc_id % 2 = 0
              THEN -1.0 - (doc_id % 97) / 97.0
              ELSE 'NaN'::DOUBLE
         END AS pagerank
  FROM documents
)"""


def _piv_cte() -> str:
    joins = "\n  ".join(
        f"LEFT JOIN (SELECT doc_id, CAST(tf AS DOUBLE) AS tf FROM tfs WHERE term = '{t}') t_{t} "
        f"ON t_{t}.doc_id = cand.docid"
        for t in DISTINCT
    )
    tf_cols = ", ".join(f"t_{t}.tf AS tf_{t}" for t in DISTINCT)
    return f"""
piv AS (
  SELECT cand.docid, {tf_cols}, CAST(l.doclen AS DOUBLE) AS doclen
  FROM cand
  {joins}
  LEFT JOIN dl l ON l.doc_id = cand.docid
)"""


def _raw_cte() -> str:
    """Raw f1..f18 with association identical to the Spark expressions."""
    k1, b = _B.k1, _B.b
    mu, lam = _I.mu, _I.lam
    # f5: fold in sorted-distinct order, unclamped idf
    f5_terms = []
    for t in sorted(set(DISTINCT)):
        df = _sub("df", t)
        f5_terms.append(
            f"(CASE WHEN tf_{t} IS NOT NULL THEN "
            f"ln((c.n_docs - {df} + 0.5) / ({df} + 0.5)) * "
            f"(tf_{t} / (tf_{t} + {k1!r} * ({1.0 - b!r} + {b!r} * doclen / c.avgdl)))"
            f" ELSE 0.0 END)"
        )
    f5 = "0.0 + " + " + ".join(f5_terms)
    # f6: product over token positions; 0.0 when nothing matched
    s_of = {
        t: (
            f"(({1.0 - lam!r} * (coalesce(tf_{t}, 0.0) + {mu!r} * ({_sub('ctf', t)} / c.c_len))"
            f" / (doclen + {mu!r})) + {lam!r} * ({_sub('ctf', t)} / c.c_len))"
        )
        for t in DISTINCT
    }
    prod = "1.0"
    for t in QTOKENS:
        prod = f"{prod} * pow({s_of[t]}, {1.0 / QLEN!r})"
    present_any = " OR ".join(f"tf_{t} IS NOT NULL" for t in DISTINCT)
    f6 = f"(CASE WHEN {present_any} THEN {prod} ELSE 0.0 END)"
    # f7 overlap over token positions
    cnt = " + ".join(
        f"(CASE WHEN tf_{t} IS NOT NULL THEN 1.0 ELSE 0.0 END)" for t in QTOKENS
    )
    f7 = f"(0.0 + {cnt}) / {float(QLEN)!r}"
    # f17 tf*ln((N+1)/df) over token positions
    f17_terms = [
        f"(CASE WHEN tf_{t} IS NOT NULL THEN tf_{t} * ln((c.n_docs + 1.0) / {_sub('df', t)}) ELSE 0.0 END)"
        for t in QTOKENS
    ]
    f17 = "0.0 + " + " + ".join(f17_terms)
    # f18 (sum ln tf + 1) / (1 + sum ln doclen + 1) over matched positions
    num = "0.0 + " + " + ".join(
        f"(CASE WHEN tf_{t} IS NOT NULL THEN ln(tf_{t}) + 1.0 ELSE 0.0 END)"
        for t in QTOKENS
    )
    den = "1.0 + " + " + ".join(
        f"(CASE WHEN tf_{t} IS NOT NULL THEN ln(doclen) + 1.0 ELSE 0.0 END)"
        for t in QTOKENS
    )
    f18 = f"({num}) / ({den})"

    guard = "CASE WHEN doclen IS NULL THEN 'NaN'::DOUBLE ELSE {expr} END"
    return f"""
raw AS (
  SELECT piv.docid,
         m.n_chars AS f1,
         CAST(length(m.url) - length(replace(m.url, '/', '')) AS DOUBLE) AS f2,
         CASE WHEN contains(lower(m.url), 'wikipedia.org') THEN 1.0 ELSE 0.0 END AS f3,
         m.pagerank AS f4,
         {guard.format(expr=f5)} AS f5,
         {guard.format(expr=f6)} AS f6,
         {guard.format(expr=f7)} AS f7,
         {guard.format(expr=f17)} AS f17,
         {guard.format(expr=f18)} AS f18
  FROM piv JOIN docmeta m ON m.docid = piv.docid
  CROSS JOIN consts c
)"""


def _norm_sql() -> str:
    """Min-max normalization with the Java Double.MIN_VALUE/MAX_VALUE init
    quirk; f8-f16 are all-NaN (absent field slots) -> 0.0 directly."""
    real = ["f1", "f2", "f3", "f4", "f5", "f6", "f7", "f17", "f18"]
    stats_cols = ", ".join(
        f"max(CASE WHEN NOT isnan({c}) THEN {c} END) AS mx_{c}, "
        f"min(CASE WHEN NOT isnan({c}) THEN {c} END) AS mn_{c}"
        for c in real
    )
    stats = f"fstats AS (SELECT {stats_cols} FROM raw)"
    norm_exprs = []
    for c in real:
        mx = f"greatest(coalesce(mx_{c}, {JAVA_DOUBLE_MIN!r}), {JAVA_DOUBLE_MIN!r})"
        mn = f"least(coalesce(mn_{c}, {JAVA_DOUBLE_MAX!r}), {JAVA_DOUBLE_MAX!r})"
        norm_exprs.append(
            f"CASE WHEN {mx} = {mn} THEN 0.0 "
            f"WHEN isnan({c}) THEN 0.0 "
            f"ELSE ({c} - {mn}) / ({mx} - {mn}) END AS {c}"
        )
    absent = ", ".join(f"0.0 AS f{j}" for j in range(8, 17))
    return (
        stats
        + f""",
norm AS (
  SELECT raw.docid, {', '.join(norm_exprs)}, {absent}
  FROM raw CROSS JOIN fstats
)"""
    )


def _letor_prelude() -> str:
    return (
        SQL_PRELUDE
        + ","
        + _cands_cte()
        + ","
        + _meta_cte()
        + ","
        + _piv_cte()
        + ","
        + _raw_cte()
        + ","
        + _norm_sql()
    )


def letor_features_sql() -> str:
    f32 = ", ".join(
        f"CAST(CAST(f{j} AS REAL) AS DOUBLE) AS f{j}" for j in range(1, 19)
    )
    return _letor_prelude() + f"\nSELECT docid, {f32} FROM norm"


def letor_rerank_sql() -> str:
    dot = "0.0 + " + " + ".join(
        f"{WEIGHTS[j - 1]!r} * f{j}" for j in range(1, 19)
    )
    return (
        _letor_prelude()
        + f""",
scored AS (
  SELECT docid,
         CAST(CAST((CASE WHEN isnan({dot}) THEN 0.0 ELSE {dot} END) AS REAL) AS DOUBLE) AS score
  FROM norm
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, docid ASC) AS INTEGER) AS rank,
       docid, score
FROM scored
ORDER BY score DESC, docid ASC
LIMIT 100"""
    )


# ---------------------------------------------------------------------------
# Multi-field LeToR (the reference's 5-field reality):
# hw5/QryEval/FeatureVector.java:74-227 walks body/title/url/inlink slots;
# here slots 0..2 = (body, lang, source) on the sf documents table and slot 3
# is absent (the reference's missing-TermVector NaN path). The query mixes a
# body-heavy token with a lang value and a source value so f8-f13 carry real
# per-candidate variation, and duplicates 'spark' for the token-position
# semantics. Oracle: per-(doc, field) tokenize/stats tables (MF_SQL_PRELUDE)
# with the same expression association as letor_features_local.
#
# Feature variation at sf0.01: f8/f10 (lang BM25/overlap) and f11/f13
# (source) split the candidates into real groups; f9/f12 (Indri on
# lang/source) are 0.0 for every candidate BY SEMANTICS — the Indri
# geometric mean zeroes whenever any query token has ctf=0 in that field
# ('spark' never appears in the single-token lang/source vocabularies) —
# which is the reference's own behavior for an OOV term with mu/lam
# smoothing over an empty collection frequency.
# ---------------------------------------------------------------------------

from search_engine_spark.driver_queries import MF_SQL_PRELUDE  # noqa: E402

MF_QUERY = "spark de src7 spark"
MF_QTOKENS = ["spark", "de", "src7", "spark"]
MF_DISTINCT = ["spark", "de", "src7"]
MF_QLEN = len(MF_QTOKENS)
MF_FIELDS = ["body", "lang", "source"]

MF_CFG = LetorConfig(
    bm25=_B, indri=_I, fields4=("body", "lang", "source", None)
)


def _normalized_rows_mf(spark: SparkSession, sf_dir: str) -> list[dict]:
    idx = load_documents_index(spark, sf_dir)
    eng = Engine(idx, ModelConfig(name=BM25))
    cands = [r["docid"] for r in eng.search(MF_QUERY, 100).collect()]
    raw = letor_features_local(
        spark, idx, MF_QTOKENS, cands, MF_CFG,
        docs_meta=_docs_meta(spark, sf_dir), f1_col="n_chars", url_col="url",
        pagerank=_pagerank(spark, sf_dir),
    )
    return normalize_features_local(raw, MF_CFG.disable)


def q_letor_features_mf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    rows = _normalized_rows_mf(spark, sf_dir)
    data = [
        tuple([r["docid"]] + [float(np.float32(r[c])) for c in FEATURE_COLS])
        for r in rows
    ]
    schema = "docid long, " + ", ".join(f"{c} double" for c in FEATURE_COLS)
    return spark.createDataFrame(data, schema)


def _fsub(col: str, term: str, field: str) -> str:
    return f"(SELECT {col} FROM fdfstats WHERE term = '{term}' AND field = '{field}')"


def _fconst(col: str, field: str) -> str:
    return f"(SELECT {col} FROM fconsts WHERE field = '{field}')"


def _mf_cands_cte() -> str:
    """BM25 #SUM body-field top-100 for MF_QUERY ('de'/'src7' have body df=0
    so only 'spark' scores, weighted x2 for the duplicate token)."""
    in_list = ", ".join(f"'{t}'" for t in MF_DISTINCT)
    return f"""
mf_lscores AS (
  SELECT t.doc_id,
         CAST(CAST(
           greatest(0.0, ln((c.n_docs - d.df + 0.5) / (d.df + 0.5)))
           * (t.tf / (t.tf + {_B.k1!r} * ({1.0 - _B.b!r} + {_B.b!r} * l.doclen / c.avgdl)))
         AS REAL) AS DOUBLE)
         * (CASE t.term WHEN 'spark' THEN 2.0 ELSE 1.0 END) AS score
  FROM ftfs t
  JOIN fdfstats d ON d.term = t.term AND d.field = 'body'
  JOIN fdl l ON l.doc_id = t.doc_id AND l.field = 'body'
  JOIN fconsts c ON c.field = 'body'
  WHERE t.field = 'body' AND t.term IN ({in_list})
),
mf_agg AS (SELECT doc_id, sum(score) AS score FROM mf_lscores GROUP BY 1),
cand AS (
  SELECT doc_id AS docid FROM mf_agg
  ORDER BY score DESC, doc_id ASC LIMIT 100
)"""


def _mf_piv_cte() -> str:
    """One tf column per (field, distinct term) + one doclen column per
    field, LEFT-joined onto the candidate set."""
    joins, cols = [], []
    for f in MF_FIELDS:
        for t in MF_DISTINCT:
            a = f"t_{f}_{t}"
            joins.append(
                f"LEFT JOIN (SELECT doc_id, CAST(tf AS DOUBLE) AS tf FROM ftfs "
                f"WHERE term = '{t}' AND field = '{f}') {a} ON {a}.doc_id = cand.docid"
            )
            cols.append(f"{a}.tf AS tf_{f}_{t}")
        joins.append(
            f"LEFT JOIN (SELECT doc_id, CAST(doclen AS DOUBLE) AS doclen FROM fdl "
            f"WHERE field = '{f}') l_{f} ON l_{f}.doc_id = cand.docid"
        )
        cols.append(f"l_{f}.doclen AS dl_{f}")
    return (
        "piv AS (\n  SELECT cand.docid, "
        + ", ".join(cols)
        + "\n  FROM cand\n  "
        + "\n  ".join(joins)
        + "\n)"
    )


def _mf_slot_exprs(f: str) -> tuple[str, str, str]:
    """(BM25, Indri, overlap) raw-feature expressions for field slot ``f``,
    association-identical to letor_features_local's per-slot folds."""
    k1, b = _B.k1, _B.b
    mu, lam = _I.mu, _I.lam
    nd = _fconst("n_docs", f)
    avgdl = _fconst("avgdl", f)
    c_len = _fconst("c_len", f)
    dl = f"dl_{f}"
    # BM25: sorted-distinct fold, unclamped idf; df=0 terms carry no tf row
    bm_terms = []
    for t in sorted(set(MF_DISTINCT)):
        df = _fsub("df", t, f)
        bm_terms.append(
            f"(CASE WHEN tf_{f}_{t} IS NOT NULL THEN "
            f"ln(({nd} - {df} + 0.5) / ({df} + 0.5)) * "
            f"(tf_{f}_{t} / (tf_{f}_{t} + {k1!r} * ({1.0 - b!r} + {b!r} * {dl} / {avgdl})))"
            f" ELSE 0.0 END)"
        )
    f_bm = "0.0 + " + " + ".join(bm_terms)
    # Indri: token-position product, absent terms default to ctf=0 smoothing
    s_of = {
        t: (
            f"(({1.0 - lam!r} * (coalesce(tf_{f}_{t}, 0.0) + {mu!r} * "
            f"(coalesce({_fsub('ctf', t, f)}, 0) / {c_len})) / ({dl} + {mu!r})) "
            f"+ {lam!r} * (coalesce({_fsub('ctf', t, f)}, 0) / {c_len}))"
        )
        for t in MF_DISTINCT
    }
    prod = "1.0"
    for t in MF_QTOKENS:
        prod = f"{prod} * pow({s_of[t]}, {1.0 / MF_QLEN!r})"
    present_any = " OR ".join(f"tf_{f}_{t} IS NOT NULL" for t in MF_DISTINCT)
    f_in = f"(CASE WHEN {present_any} THEN {prod} ELSE 0.0 END)"
    # overlap over token positions
    cnt = " + ".join(
        f"(CASE WHEN tf_{f}_{t} IS NOT NULL THEN 1.0 ELSE 0.0 END)"
        for t in MF_QTOKENS
    )
    f_ov = f"(0.0 + {cnt}) / {float(MF_QLEN)!r}"
    return f_bm, f_in, f_ov


def _mf_raw_cte() -> str:
    feats = []
    for slot, f in enumerate(MF_FIELDS):
        fnums = (5 + 3 * slot, 6 + 3 * slot, 7 + 3 * slot)
        guard = f"CASE WHEN dl_{f} IS NULL THEN 'NaN'::DOUBLE ELSE {{e}} END"
        for fn, e in zip(fnums, _mf_slot_exprs(f)):
            feats.append(guard.format(e=e) + f" AS f{fn}")
    # f17/f18: body slot, token-position folds (same as the body-only oracle)
    nd = _fconst("n_docs", "body")
    f17_terms = [
        f"(CASE WHEN tf_body_{t} IS NOT NULL THEN tf_body_{t} * "
        f"ln(({nd} + 1.0) / {_fsub('df', t, 'body')}) ELSE 0.0 END)"
        for t in MF_QTOKENS
    ]
    f17 = "0.0 + " + " + ".join(f17_terms)
    num = "0.0 + " + " + ".join(
        f"(CASE WHEN tf_body_{t} IS NOT NULL THEN ln(tf_body_{t}) + 1.0 ELSE 0.0 END)"
        for t in MF_QTOKENS
    )
    den = "1.0 + " + " + ".join(
        f"(CASE WHEN tf_body_{t} IS NOT NULL THEN ln(dl_body) + 1.0 ELSE 0.0 END)"
        for t in MF_QTOKENS
    )
    guard_b = "CASE WHEN dl_body IS NULL THEN 'NaN'::DOUBLE ELSE {e} END"
    feats.append(guard_b.format(e=f17) + " AS f17")
    feats.append(guard_b.format(e=f"({num}) / ({den})") + " AS f18")
    return f"""
raw AS (
  SELECT piv.docid,
         m.n_chars AS f1,
         CAST(length(m.url) - length(replace(m.url, '/', '')) AS DOUBLE) AS f2,
         CASE WHEN contains(lower(m.url), 'wikipedia.org') THEN 1.0 ELSE 0.0 END AS f3,
         m.pagerank AS f4,
         {', '.join(feats)}
  FROM piv JOIN docmeta m ON m.docid = piv.docid
)"""


def _mf_norm_sql() -> str:
    """Min-max normalization as _norm_sql, but slots 0-2 are real and only
    f14-f16 (the absent fourth slot) short-circuit to 0.0."""
    real = [f"f{j}" for j in list(range(1, 14)) + [17, 18]]
    stats_cols = ", ".join(
        f"max(CASE WHEN NOT isnan({c}) THEN {c} END) AS mx_{c}, "
        f"min(CASE WHEN NOT isnan({c}) THEN {c} END) AS mn_{c}"
        for c in real
    )
    stats = f"fstats AS (SELECT {stats_cols} FROM raw)"
    norm_exprs = []
    for c in real:
        mx = f"greatest(coalesce(mx_{c}, {JAVA_DOUBLE_MIN!r}), {JAVA_DOUBLE_MIN!r})"
        mn = f"least(coalesce(mn_{c}, {JAVA_DOUBLE_MAX!r}), {JAVA_DOUBLE_MAX!r})"
        norm_exprs.append(
            f"CASE WHEN {mx} = {mn} THEN 0.0 "
            f"WHEN isnan({c}) THEN 0.0 "
            f"ELSE ({c} - {mn}) / ({mx} - {mn}) END AS {c}"
        )
    absent = ", ".join(f"0.0 AS f{j}" for j in range(14, 17))
    return (
        stats
        + f""",
norm AS (
  SELECT raw.docid, {', '.join(norm_exprs)}, {absent}
  FROM raw CROSS JOIN fstats
)"""
    )


def letor_features_mf_sql() -> str:
    f32 = ", ".join(
        f"CAST(CAST(f{j} AS REAL) AS DOUBLE) AS f{j}" for j in range(1, 19)
    )
    return (
        MF_SQL_PRELUDE
        + ","
        + _mf_cands_cte()
        + ","
        + _meta_cte()
        + ","
        + _mf_piv_cte()
        + ","
        + _mf_raw_cte()
        + ","
        + _mf_norm_sql()
        + f"\nSELECT docid, {f32} FROM norm"
    )


QUERIES = {
    "letor_features": q_letor_features,
    "letor_features_mf": q_letor_features_mf,
    "letor_rerank_topk": q_letor_rerank,
}
ORACLES = {
    "letor_features": letor_features_sql(),
    "letor_features_mf": letor_features_mf_sql(),
    "letor_rerank_topk": letor_rerank_sql(),
}
