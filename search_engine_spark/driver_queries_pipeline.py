"""Driver-contract queries for the training-data pipeline operators
(dedup / similarity / text analysis), each with a DuckDB oracle twin
generated from the SAME hash coefficients and arithmetic as the Spark plan,
so values match bitwise.

Portability contract: every hash is integer arithmetic over ascii codes
(pipeline/hashing.py) — Spark `aggregate` == DuckDB `list_reduce` == numpy
loop. Jaccard/cosine divisions are double ops in identical order on both
sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.pipeline import dedup as dd
from search_engine_spark.pipeline import similarity as sim
from search_engine_spark.pipeline import textstats as ts
from search_engine_spark.pipeline.hashing import MERSENNE31, minhash_coeffs
from search_engine_spark.tokenize import WHITESPACE_TOKENIZER

M = MERSENNE31

# shared fixture knobs (small enough that the generated SQL stays readable)
MH_K = 2          # shingle length (tokens)
MH_N = 16         # minhash signature length
MH_BANDS = 8      # -> rows_per_band = 2
MH_TAU = 0.2
NJ_K = 1          # unigram jaccard
NJ_TAU = 0.5
ANN_K = 10
ANN_DIM = 64
ANN_QVEC = [((i * 37) % 64 - 32) / 32.0 for i in range(ANN_DIM)]
SIMHASH_MAXHAM = 8

_COEFFS = minhash_coeffs(MH_N)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# SQL twin builders
# ---------------------------------------------------------------------------

SQL_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')"


def _sql_charpoly(expr: str, base: int = 131) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, [ascii(c)::BIGINT FOR c IN"
        f" string_split({expr}, '')]), (h, c) -> (h * {base} + c) % {M})"
    )


def _sql_shingle_keys(k: int) -> str:
    """DISTINCT 31-bit shingle keys of the whitespace tokens (matches
    dedup.shingle_keys)."""
    sh = (
        f"CASE WHEN len(toks) < {k} THEN [] ELSE "
        f"[array_to_string(list_slice(toks, i, i + {k - 1}), ' ') "
        f"FOR i IN range(1, len(toks) - {k} + 2)] END"
    )
    return f"list_distinct(list_transform({sh}, s -> {_sql_charpoly('s')}))"


def _sql_minhash_sigs(k: int) -> str:
    """CTE `sigs`: doc_id, s0..s{n-1} (+ keys list)."""
    sig_cols = ",\n         ".join(
        f"coalesce(list_min(list_transform(keys, x -> (x * {a} + {b}) % {M})), {M}) AS s{i}"
        for i, (a, b) in enumerate(_COEFFS)
    )
    return f"""
tokd AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
keyd AS (SELECT doc_id, {_sql_shingle_keys(k)} AS keys FROM tokd),
sigs AS (SELECT doc_id, keys,
         {sig_cols}
  FROM keyd)"""


def _sql_band_hash(band: int, rows: int) -> str:
    expr = "0"
    for r in range(rows):
        expr = f"(({expr}) * 131 + s{band * rows + r}) % {M}"
    return expr


def _sql_lsh_pairs(bands: int, rows: int) -> str:
    """CTE `pairs`: distinct candidate (id_a, id_b) sharing >=1 band."""
    bh_cols = ", ".join(
        f"{_sql_band_hash(b, rows)} AS bh{b}" for b in range(bands)
    )
    unions = "\nUNION\n".join(
        f"SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM banded a JOIN banded b"
        f" ON a.bh{b} = b.bh{b} AND a.doc_id < b.doc_id"
        for b in range(bands)
    )
    return f"""
banded AS (SELECT doc_id, keys, {bh_cols} FROM sigs),
pairs AS ({unions})"""


# ---------------------------------------------------------------------------
# registry (merged into __spark_entry__ via driver_queries)
# ---------------------------------------------------------------------------

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name, fn, sql=None):
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


# -- exact dedup (documents doubled so duplicate groups exist) --------------


def _q_dedup_exact(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    doubled = d.unionByName(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    return dd.exact_dup_groups(doubled).select(
        "content_sha256",
        "n_dups",
        "canonical_id",
        F.array_join("member_ids", ",").alias("ids_str"),
    )


_register(
    "dedup_exact_groups",
    _q_dedup_exact,
    f"""
WITH doubled AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000, text FROM documents
)
SELECT sha256(text) AS content_sha256,
       count(*)::BIGINT AS n_dups,
       min(doc_id)::BIGINT AS canonical_id,
       array_to_string(list_sort(list(doc_id)), ',') AS ids_str
FROM doubled GROUP BY 1 HAVING count(*) > 1""",
)


# -- minhash signatures ------------------------------------------------------


def _q_minhash_sigs(spark, sf_dir):
    return dd.minhash_signatures(
        _docs(spark, sf_dir), "doc_id", "text", MH_K, MH_N,
        tokenizer=WHITESPACE_TOKENIZER,
    ).select("id", F.array_join("signature", ",").alias("sig_str"))


_register(
    "minhash_signatures",
    _q_minhash_sigs,
    "WITH "
    + _sql_minhash_sigs(MH_K)
    + f"""
SELECT doc_id AS id,
       array_to_string([{", ".join(f's{i}' for i in range(MH_N))}], ',') AS sig_str
FROM sigs""",
)


# -- minhash LSH near-dup pairs (candidates + exact-jaccard verify) ----------


def _q_minhash_near_dups(spark, sf_dir):
    return dd.minhash_near_dups(
        _docs(spark, sf_dir), "doc_id", "text",
        k=MH_K, n_hashes=MH_N, bands=MH_BANDS, threshold=MH_TAU,
        tokenizer=WHITESPACE_TOKENIZER,
    )


_register(
    "minhash_near_dups",
    _q_minhash_near_dups,
    "WITH "
    + _sql_minhash_sigs(MH_K)
    + ","
    + _sql_lsh_pairs(MH_BANDS, MH_N // MH_BANDS)
    + f"""
SELECT p.id_a, p.id_b,
       (len(list_intersect(ka.keys, kb.keys))::DOUBLE
        / (len(ka.keys) + len(kb.keys) - len(list_intersect(ka.keys, kb.keys)))::DOUBLE
       ) AS jaccard
FROM pairs p
JOIN sigs ka ON ka.doc_id = p.id_a
JOIN sigs kb ON kb.doc_id = p.id_b
WHERE (len(list_intersect(ka.keys, kb.keys))::DOUBLE
        / (len(ka.keys) + len(kb.keys) - len(list_intersect(ka.keys, kb.keys)))::DOUBLE
      ) >= {MH_TAU!r}""",
)


# -- dup-GROUP consolidation (connected components over near-dup pairs) -----


def _q_dedup_groups(spark, sf_dir):
    pairs = dd.minhash_near_dups(
        _docs(spark, sf_dir), "doc_id", "text",
        k=MH_K, n_hashes=MH_N, bands=MH_BANDS, threshold=MH_TAU,
        tokenizer=WHITESPACE_TOKENIZER,
    )
    return dd.dup_groups(pairs)


_register(
    "dedup_groups",
    _q_dedup_groups,
    # the oracle computes the same components with a recursive CTE: reach
    # (id, r) = r is reachable from id over the undirected pair graph;
    # min(r) per id is the component min — exactly dup_groups' fixpoint
    "WITH RECURSIVE "
    + _sql_minhash_sigs(MH_K).lstrip()
    + ","
    + _sql_lsh_pairs(MH_BANDS, MH_N // MH_BANDS)
    + f""",
verified AS (
  SELECT p.id_a, p.id_b FROM pairs p
  JOIN sigs ka ON ka.doc_id = p.id_a
  JOIN sigs kb ON kb.doc_id = p.id_b
  WHERE (len(list_intersect(ka.keys, kb.keys))::DOUBLE
         / (len(ka.keys) + len(kb.keys) - len(list_intersect(ka.keys, kb.keys)))::DOUBLE
        ) >= {MH_TAU!r}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM verified
  UNION SELECT id_b, id_a FROM verified),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst)
SELECT id::BIGINT AS id, min(r)::BIGINT AS group_id,
       (id = min(r)) AS keep
FROM reach GROUP BY id""",
)


# -- exact n-gram jaccard (all pairs) ---------------------------------------


def _q_ngram_jaccard(spark, sf_dir):
    return dd.ngram_jaccard_pairs(
        _docs(spark, sf_dir), "doc_id", "text", NJ_K, NJ_TAU,
        tokenizer=WHITESPACE_TOKENIZER,
    )


_register(
    "ngram_jaccard_pairs",
    _q_ngram_jaccard,
    f"""
WITH tokd AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
keyd AS (SELECT doc_id, {_sql_shingle_keys(NJ_K)} AS keys FROM tokd)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       (len(list_intersect(a.keys, b.keys))::DOUBLE
        / (len(a.keys) + len(b.keys) - len(list_intersect(a.keys, b.keys)))::DOUBLE
       ) AS jaccard
FROM keyd a JOIN keyd b ON a.doc_id < b.doc_id
WHERE (len(list_intersect(a.keys, b.keys))::DOUBLE
        / (len(a.keys) + len(b.keys) - len(list_intersect(a.keys, b.keys)))::DOUBLE
      ) >= {NJ_TAU!r}""",
)


# -- simhash fingerprints + near-dups ---------------------------------------


def _q_simhash(spark, sf_dir):
    return dd.simhash64(_docs(spark, sf_dir), "doc_id", "text",
                        tokenizer=WHITESPACE_TOKENIZER)


def _sql_simhash_fps() -> str:
    h1 = _sql_charpoly("term", 131)
    h2 = _sql_charpoly("term", 137)
    sums = []
    for j in range(31):
        sums.append(f"sum(tf * ((((h1 >> {j}) & 1) * 2) - 1)) AS s{j}")
    for j in range(31):
        sums.append(f"sum(tf * ((((h2 >> {j}) & 1) * 2) - 1)) AS s{31 + j}")
    fp = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)" for j in range(62)
    )
    return f"""
tok0 AS (SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents),
tfs2 AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok0 GROUP BY 1, 2),
hashed AS (SELECT doc_id, tf, {h1} AS h1, {h2} AS h2 FROM tfs2),
bitsums AS (SELECT doc_id, {", ".join(sums)} FROM hashed GROUP BY doc_id),
fps AS (SELECT doc_id AS id, ({fp})::BIGINT AS simhash FROM bitsums)"""


_register(
    "simhash_fingerprints",
    _q_simhash,
    "WITH " + _sql_simhash_fps() + "\nSELECT id, simhash FROM fps",
)


def _q_simhash_near(spark, sf_dir):
    return dd.simhash_near_dups(
        _docs(spark, sf_dir), "doc_id", "text", SIMHASH_MAXHAM,
        tokenizer=WHITESPACE_TOKENIZER,
    )


_register(
    "simhash_near_dups",
    _q_simhash_near,
    "WITH "
    + _sql_simhash_fps()
    + f""",
chunks AS (
  SELECT id, simhash, c.chunk, (simhash >> (16 * c.chunk)) & 65535 AS val
  FROM fps, (SELECT unnest([0,1,2,3]) AS chunk) c
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.simhash AS sh_a, b.simhash AS sh_b
  FROM chunks a JOIN chunks b
    ON a.chunk = b.chunk AND a.val = b.val AND a.id < b.id
)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b))::INTEGER AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {SIMHASH_MAXHAM}""",
)


# -- ANN cosine top-k (brute force, the exact baseline) ---------------------


def _q_ann_topk(spark, sf_dir):
    out = sim.cosine_topk(_embs(spark, sf_dir), ANN_QVEC, ANN_K)
    return out.select(
        "rank", "id", F.col("cosine").cast("float").cast("double").alias("cosine")
    )


def _sql_ann() -> str:
    q = "[" + ", ".join(repr(x) for x in ANN_QVEC) + "]"
    qn = sum(x * x for x in ANN_QVEC) ** 0.5
    dot = (
        f"list_reduce(list_prepend(0.0::DOUBLE, [embedding[i]::DOUBLE * ({q}::DOUBLE[])[i]"
        f" FOR i IN range(1, {ANN_DIM} + 1)]), (a, v) -> a + v)"
    )
    nrm = (
        "sqrt(list_reduce(list_prepend(0.0::DOUBLE, [embedding[i]::DOUBLE * embedding[i]::DOUBLE"
        f" FOR i IN range(1, {ANN_DIM} + 1)]), (a, v) -> a + v))"
    )
    return f"""
WITH scored AS (
  SELECT vec_id::BIGINT AS id, ({dot} / ({nrm} * {qn!r})) AS cosine
  FROM embeddings
)
SELECT CAST(row_number() OVER (ORDER BY cosine DESC, id ASC) AS INTEGER) AS rank,
       id, CAST(CAST(cosine AS REAL) AS DOUBLE) AS cosine
FROM scored ORDER BY cosine DESC, id ASC LIMIT {ANN_K}"""


_register("ann_cosine_topk", _q_ann_topk, _sql_ann())


def _q_ivf_topk(spark, sf_dir):
    # FULL-probe configuration (n_probe == n_cells): the IVF result is then
    # provably the exact brute-force top-k REGARDLESS of the KMeans cell
    # assignment, so the brute-force SQL oracle applies bitwise. The pruned
    # n_probe < n_cells path (the scale behavior) is exercised by
    # tests/test_pipeline.py recall assertions.
    idx = sim.IvfIndex.build(_embs(spark, sf_dir), n_cells=8)
    out = idx.search(ANN_QVEC, ANN_K, n_probe=8)
    return out.select(
        "rank", "id", F.col("cosine").cast("float").cast("double").alias("cosine")
    )


_register("ivf_cosine_topk", _q_ivf_topk, _sql_ann())


# -- embedding cosine near-dup pairs ----------------------------------------

EMB_DUP_STRIDE = 25       # every 25th vector gets a planted near-duplicate
EMB_DUP_OFFSET = 1_000_000
EMB_TAU = 0.9


def _planted_embs(spark, sf_dir):
    """Embeddings + planted near-duplicates: every EMB_DUP_STRIDE-th vector
    is copied under a shifted id with a tiny deterministic per-component
    perturbation (cosine ≈ 1-1e-6 ≫ τ), so the near-dup operator has known
    answers (the r01 entry returned 0 rows — vacuously true)."""
    e = _embs(spark, sf_dir)
    pert = (
        e.where(F.col("vec_id") % EMB_DUP_STRIDE == 0)
        # rename first: a same-select alias of vec_id would otherwise
        # capture the lambda's vec_id via lateral column alias resolution
        .select(F.col("vec_id").alias("_vid0"), "embedding")
        .select(
            (F.col("_vid0") + EMB_DUP_OFFSET).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: (
                    x.cast("double")
                    + (
                        ((F.col("_vid0") + F.lit(EMB_DUP_OFFSET)) * 31 + i) % 7 - 3
                    ).cast("double")
                    * F.lit(1e-4)
                ).cast("float"),
            ).alias("embedding"),
        )
    )
    return e.select("vec_id", "embedding").unionByName(pert)


def _q_emb_near_dups(spark, sf_dir):
    out = sim.embedding_near_dups(
        _planted_embs(spark, sf_dir), ANN_DIM, threshold=EMB_TAU
    )
    return out.select(
        "id_a", "id_b", F.col("cosine").cast("float").cast("double").alias("cosine")
    )


def _sql_emb_near_dups() -> str:
    """Brute-force all-pairs cosine ≥ τ over the same planted set — equality
    with the Spark LSH-bucketed path doubles as a 100%-recall check of the
    sign-sketch at this τ on this data."""
    pert_elem = (
        "(embedding[i]::DOUBLE + "
        f"(((vec_id + {EMB_DUP_OFFSET}) * 31 + (i - 1)) % 7 - 3)::DOUBLE * 1e-4)::REAL"
    )
    dot_ab = (
        f"list_reduce(list_prepend(0.0::DOUBLE, [a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE"
        f" FOR i IN range(1, {ANN_DIM} + 1)]), (x, v) -> x + v)"
    )

    def nrm(side):
        return (
            f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, [{side}.embedding[i]::DOUBLE * {side}.embedding[i]::DOUBLE"
            f" FOR i IN range(1, {ANN_DIM} + 1)]), (x, v) -> x + v))"
        )

    cos = f"({dot_ab} / ({nrm('a')} * {nrm('b')}))"
    return f"""
WITH planted AS (
  SELECT vec_id::BIGINT AS vec_id, embedding FROM embeddings
  UNION ALL
  SELECT (vec_id + {EMB_DUP_OFFSET})::BIGINT,
         [{pert_elem} FOR i IN range(1, {ANN_DIM} + 1)]
  FROM embeddings WHERE vec_id % {EMB_DUP_STRIDE} = 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(CAST({cos} AS REAL) AS DOUBLE) AS cosine
FROM planted a JOIN planted b ON a.vec_id < b.vec_id
WHERE {cos} >= {EMB_TAU!r}"""


_register("embedding_near_dups", _q_emb_near_dups, _sql_emb_near_dups())


# -- text analysis ----------------------------------------------------------


def _q_token_counts(spark, sf_dir):
    return ts.token_counts(_docs(spark, sf_dir))


_register(
    "token_counts",
    _q_token_counts,
    rf"""
SELECT doc_id::BIGINT AS id,
       len({SQL_TOKS})::BIGINT AS ws_tokens,
       len(regexp_extract_all(text, '{ts.BPE_TOKEN_RE}'))::BIGINT AS bpe_tokens,
       length(text)::BIGINT AS n_chars
FROM documents""",
)


def _q_quality(spark, sf_dir):
    return ts.quality_scores(_docs(spark, sf_dir))


_register(
    "quality_scores",
    _q_quality,
    rf"""
WITH base AS (
  SELECT doc_id, text, {SQL_TOKS} AS toks,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
  FROM documents
),
feat AS (
  SELECT doc_id,
         len(toks)::BIGINT AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN (n_chars - (len(toks) - 1))::DOUBLE / len(toks) ELSE 0.0 END AS mean_token_len,
         CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, x -> list_contains({sorted(ts.STOPWORDS_EN)!r}, x)))::DOUBLE / len(toks)
              ELSE 0.0 END AS stopword_ratio
  FROM base
)
SELECT doc_id::BIGINT AS id, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
       (least(1.0::DOUBLE, n_tokens / 100.0)
        * (1.0 - least(1.0::DOUBLE, punct_ratio * 4))
        * (0.5 + least(0.5::DOUBLE, stopword_ratio))) AS quality
FROM feat""",
)


def _q_langid(spark, sf_dir):
    return ts.lang_id(_docs(spark, sf_dir))


def _sql_langid() -> str:
    hits = ",\n       ".join(
        f"len(list_filter(toks, x -> list_contains({sorted(ws)!r}, x)))::BIGINT AS hits_{lang}"
        for lang, ws in sorted(ts.LANG_PROFILES.items())
    )
    langs = sorted(ts.LANG_PROFILES)
    best, best_n = "'und'", "0::BIGINT"
    for lang in sorted(langs, reverse=True):
        c = f"hits_{lang}"
        best = f"CASE WHEN ({c} > {best_n}) OR (({c} = {best_n}) AND ({c} > 0)) THEN '{lang}' ELSE {best} END"
        best_n = f"CASE WHEN ({c} > {best_n}) OR (({c} = {best_n}) AND ({c} > 0)) THEN {c} ELSE {best_n} END"
    return f"""
WITH tokd AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
hits AS (SELECT doc_id,
       {hits}
  FROM tokd)
SELECT doc_id::BIGINT AS id, {", ".join(f'hits_{lang}' for lang in langs)},
       ({best}) AS lang_pred
FROM hits"""


_register("lang_id", _q_langid, _sql_langid())


def _q_fingerprint(spark, sf_dir):
    return ts.doc_fingerprint(_docs(spark, sf_dir))


_register(
    "doc_fingerprint",
    _q_fingerprint,
    f"""
WITH tokd AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents)
SELECT doc_id::BIGINT AS id,
       list_reduce(list_prepend(0::BIGINT,
         list_transform(toks, t -> {_sql_charpoly('t')})),
         (h, x) -> (h * 131 + x) % {M}) AS fingerprint
FROM tokd""",
)
