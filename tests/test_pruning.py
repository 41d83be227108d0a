"""Block-max pruned BM25 top-k must be identical to the exact plan
(rank, docid, ext id, score — bitwise), while actually skipping blocks."""

import pytest

from search_engine_spark.config import BM25, ModelConfig
from search_engine_spark.engine.pruning import PruneStats, bm25_topk_pruned
from search_engine_spark.engine.runner import Engine
from search_engine_spark.index.persist import BuildConfig, PackedIndex, build_persistent_index
from search_engine_spark.tokenize import CODE_TOKENIZER


@pytest.fixture(scope="module")
def pidx(spark, code_docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pruneidx") / "v1")
    cfg = BuildConfig(
        out_dir=out, n_buckets=4, block_size=8, salt_threshold=40, n_salts=4,
        fields={"body": "content"}, tokenizer=CODE_TOKENIZER,
    )
    build_persistent_index(spark, code_docs, cfg)
    return PackedIndex(spark, out)


QUERIES = [
    ["lock", "free", "queue"],
    ["parse_init", "token_next"],
    ["rare_alpha", "lock"],          # df=1 term dominates idf
    ["open", "file", "handle", "ring", "buffer"],
    ["self", "lock"],                # heavy salted term + selective term
]


@pytest.mark.parametrize("terms", QUERIES, ids=["+".join(q) for q in QUERIES])
def test_pruned_identical_to_exact(spark, pidx, terms, code_index):
    k = 20
    stats = PruneStats()
    pruned = [
        (r["rank"], r["docid"], r["ext_docid"], r["score"])
        for r in bm25_topk_pruned(pidx, terms, k=k, stats=stats).collect()
    ]
    eng = Engine(code_index, ModelConfig(name=BM25), tokenizer=CODE_TOKENIZER)
    exact = [
        (r["rank"], r["docid"], r["ext_docid"], r["score"])
        for r in eng.search(" ".join(terms), k).collect()
    ]
    assert pruned == exact
    assert stats.n_blocks_total > 0
    assert stats.seed_mode == "driver"  # pyarrow planner engaged, no seed job


@pytest.mark.parametrize("terms", QUERIES[:2], ids=["+".join(q) for q in QUERIES[:2]])
def test_spark_seed_fallback_identical(spark, pidx, terms, code_index, monkeypatch):
    """SPARK_GRAFT_PRUNE_SPARK_SEED=1 forces the r03 two-phase Spark seed —
    the fallback for layouts/tombstone-sets the driver can't read; its output
    must stay bitwise the exact plan's too."""
    monkeypatch.setenv("SPARK_GRAFT_PRUNE_SPARK_SEED", "1")
    k = 20
    stats = PruneStats()
    pruned = [
        tuple(r) for r in bm25_topk_pruned(pidx, terms, k=k, stats=stats).collect()
    ]
    eng = Engine(code_index, ModelConfig(name=BM25), tokenizer=CODE_TOKENIZER)
    exact = [tuple(r) for r in eng.search(" ".join(terms), k).collect()]
    assert pruned == exact
    assert stats.seed_mode == "spark"


def test_pruning_skips_blocks(spark, pidx):
    """A selective query over a corpus with a dominant rare term must not
    scan every block. (With an idf-clamped heavy term and k past the nonzero
    scores, θ=0 forces a full scan for exact tie semantics — so we use a
    query whose θ stays positive.)"""
    stats = PruneStats()
    bm25_topk_pruned(pidx, ["rare_alpha", "lock"], k=1, stats=stats).collect()
    assert stats.n_blocks_scanned < stats.n_blocks_total, (
        f"scanned {stats.n_blocks_scanned}/{stats.n_blocks_total}"
    )


def test_absent_term_query(spark, pidx):
    from search_engine_spark.corpus import ABSENT_TERM

    assert bm25_topk_pruned(pidx, [ABSENT_TERM], k=5).collect() == []


@pytest.fixture(scope="module")
def bursty_pidx(spark, tmp_path_factory):
    """Bursty corpus (identifier locality — corpus.py repo themes): the
    per-block max_tf skew block-max pruning was designed for."""
    from search_engine_spark.corpus import code_corpus_df, with_docids

    out = str(tmp_path_factory.mktemp("pruneburst") / "v1")
    docs = with_docids(code_corpus_df(spark, 4000, bursty=True))
    cfg = BuildConfig(
        out_dir=out, n_buckets=4, block_size=32, merge_partitions=8,
        fields={"body": "content"}, tokenizer=CODE_TOKENIZER,
    )
    build_persistent_index(spark, docs, cfg)
    return PackedIndex(spark, out)


def test_bursty_pruning_skips_and_is_identical(spark, bursty_pidx):
    """On the bursty corpus a same-theme query must skip a meaningful share
    of blocks AND stay bitwise-identical to the exact plan. (On the i.i.d.
    corpus block bounds are homogeneous and nothing CAN skip — the r03
    finding; burstiness is the property that makes pruning pay.)"""
    from search_engine_spark.corpus import theme_terms

    eng = Engine(bursty_pidx, ModelConfig(name=BM25), tokenizer=CODE_TOKENIZER)
    skipped_any = False
    for th in (0, 1, 2):
        q = theme_terms(th)[:3]
        st = PruneStats()
        pruned = [tuple(r) for r in bm25_topk_pruned(bursty_pidx, q, k=10, stats=st).collect()]
        exact = [tuple(r) for r in eng.search(" ".join(q), 10).collect()]
        assert pruned == exact and pruned, f"theme {th} diverged"
        if st.n_blocks_scanned < st.n_blocks_total:
            skipped_any = True
    assert skipped_any, "no theme query skipped a single block"


# --------------------------------------------------------------------------
# weighted Indri pruning (#AND / #WAND / #WSUM): engine/pruning.py MaxScore
# --------------------------------------------------------------------------

from search_engine_spark.config import INDRI  # noqa: E402
from search_engine_spark.engine.pruning import indri_topk_pruned  # noqa: E402

INDRI_QUERIES = [
    ("and", None, ["lock", "free", "queue"]),
    ("and", None, ["self", "lock"]),  # heavy salted term + selective term
    ("wand", [0.7, 0.2, 0.1], ["lock", "queue", "slot"]),
    ("wsum", [0.5, 0.3, 0.2], ["ring", "buffer", "slot"]),
    ("wsum", [0.9, 0.1], ["rare_alpha", "lock"]),  # df=1 term dominates
]


def _indri_query_text(kind, weights, terms):
    if kind == "and":
        return " ".join(terms)  # Indri default wrap is #AND
    body = " ".join(f"{w} {t}" for w, t in zip(weights, terms))
    return f"#{kind.upper()}({body})"


@pytest.mark.parametrize(
    "kind,weights,terms", INDRI_QUERIES,
    ids=[f"{k}-{'+'.join(t)}" for k, _, t in INDRI_QUERIES],
)
def test_indri_pruned_identical_to_exact(
    spark, pidx, code_index, monkeypatch, kind, weights, terms
):
    k = 20
    stats = PruneStats()
    res = indri_topk_pruned(pidx, kind, terms, weights, k=k, stats=stats)
    assert res is not None
    pruned = [
        (r["rank"], r["docid"], r["ext_docid"], r["score"])
        for r in res.collect()
    ]
    monkeypatch.setenv("SPARK_GRAFT_NO_PRUNE", "1")
    eng = Engine(code_index, ModelConfig(name=INDRI), tokenizer=CODE_TOKENIZER)
    exact = [
        (r["rank"], r["docid"], r["ext_docid"], r["score"])
        for r in eng.search(_indri_query_text(kind, weights, terms), k).collect()
    ]
    assert pruned == exact and pruned
    assert stats.seed_mode == "driver"
    assert stats.n_blocks_total > 0


def test_indri_pruned_fallback_contract(spark, pidx):
    from search_engine_spark.corpus import ABSENT_TERM

    # absent term -> degenerate zero-score combine -> exact plan
    assert indri_topk_pruned(pidx, "and", ["lock", ABSENT_TERM], k=5) is None
    # duplicate terms -> term-keyed pivot can't split children
    assert indri_topk_pruned(pidx, "and", ["lock", "lock"], k=5) is None
    # negative / zero-total weights break UB monotonicity
    assert indri_topk_pruned(pidx, "wand", ["lock", "queue"], [0.5, -0.1], k=5) is None
    assert indri_topk_pruned(pidx, "wsum", ["lock", "queue"], [0.0, 0.0], k=5) is None


def test_indri_engine_dispatch(spark, pidx, code_index, monkeypatch):
    """Engine.search routes flat Indri shapes through the pruned plan past
    the block gate, bitwise-identical to the exact pivot plan."""
    monkeypatch.setenv("SPARK_GRAFT_PRUNE_MIN_BLOCKS", "1")
    eng = Engine(pidx, ModelConfig(name=INDRI), tokenizer=CODE_TOKENIZER)
    got = [tuple(r) for r in eng.search("#WAND(0.7 lock 0.2 queue 0.1 slot)", 15).collect()]
    assert eng.last_prune_stats is not None
    assert eng.last_prune_stats.seed_mode == "driver"
    monkeypatch.setenv("SPARK_GRAFT_NO_PRUNE", "1")
    exact_eng = Engine(code_index, ModelConfig(name=INDRI), tokenizer=CODE_TOKENIZER)
    want = [tuple(r) for r in exact_eng.search("#WAND(0.7 lock 0.2 queue 0.1 slot)", 15).collect()]
    assert got == want and got


def test_indri_bursty_pruning_skips_and_is_identical(spark, bursty_pidx, monkeypatch):
    """Same-theme weighted queries on the bursty corpus must skip blocks AND
    stay bitwise the exact plan's."""
    from search_engine_spark.corpus import theme_terms

    monkeypatch.setenv("SPARK_GRAFT_NO_PRUNE", "1")
    eng = Engine(bursty_pidx, ModelConfig(name=INDRI), tokenizer=CODE_TOKENIZER)
    skipped_any = False
    for th in (0, 1, 2):
        q = theme_terms(th)[:3]
        w = [0.6, 0.3, 0.1]
        st = PruneStats()
        res = indri_topk_pruned(bursty_pidx, "wsum", q, w, k=10, stats=st)
        assert res is not None
        pruned = [tuple(r) for r in res.collect()]
        text = "#WSUM(" + " ".join(f"{wi} {t}" for wi, t in zip(w, q)) + ")"
        exact = [tuple(r) for r in eng.search(text, 10).collect()]
        assert pruned == exact and pruned, f"theme {th} diverged"
        if st.n_blocks_scanned < st.n_blocks_total:
            skipped_any = True
    assert skipped_any, "no weighted theme query skipped a single block"
