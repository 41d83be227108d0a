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
