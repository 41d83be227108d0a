"""Index format v1: codec roundtrip (property-based), persistent build,
salted heavy terms, checkpointed resume (kill + re-run => identical index)."""

import glob
import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.config import BM25, INDRI, ModelConfig
from search_engine_spark.engine.runner import Engine
from search_engine_spark.index.codec import (
    decode_block,
    delta_decode,
    delta_encode,
    encode_blocks,
    varint_decode,
    varint_encode,
)
from search_engine_spark.index.persist import (
    BuildConfig,
    Manifest,
    PackedIndex,
    build_persistent_index,
)
from search_engine_spark.tokenize import CODE_TOKENIZER

# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=300)
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(vals):
    arr = np.array(sorted(vals), dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


from hypothesis import HealthCheck


@given(st.data())
@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.data_too_large],
)
def test_block_roundtrip(data):
    n = data.draw(st.integers(min_value=1, max_value=100))
    docids = np.array(
        sorted(
            data.draw(
                st.sets(st.integers(min_value=0, max_value=10**7), min_size=n, max_size=n)
            )
        ),
        dtype=np.int64,
    )
    tfs = np.array(
        data.draw(st.lists(st.integers(1, 40), min_size=n, max_size=n)), dtype=np.int64
    )
    dls = np.array(
        data.draw(st.lists(st.integers(1, 5000), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    poss = [
        np.array(
            sorted(
                data.draw(
                    st.sets(st.integers(0, 10**5), min_size=int(t), max_size=int(t))
                )
            ),
            dtype=np.int64,
        )
        for t in tfs
    ]
    blocks = encode_blocks(docids, tfs, dls, poss, block_size=64)
    dd, tt, ll, pp = [], [], [], []
    for b in blocks:
        d, t, l, p = decode_block(b, with_positions=True)
        assert b["min_docid"] == int(d[0]) and b["max_docid"] == int(d[-1])
        assert b["max_tf"] == int(t.max()) and b["min_doclen"] == int(l.min())
        dd.append(d), tt.append(t), ll.append(l), pp.extend(p)
    assert np.array_equal(np.concatenate(dd), docids)
    assert np.array_equal(np.concatenate(tt), tfs)
    assert np.array_equal(np.concatenate(ll), dls)
    assert all(np.array_equal(a, b) for a, b in zip(pp, poss))


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        delta_encode(np.array([3, 1, 2]))


# ---------------------------------------------------------------------------
# persistent build
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def built(spark, code_docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx") / "v1")
    cfg = BuildConfig(
        out_dir=out, n_buckets=4, block_size=16, salt_threshold=40, n_salts=4,
        fields={"body": "content"}, tokenizer=CODE_TOKENIZER,
    )
    counters = build_persistent_index(spark, code_docs, cfg)
    return out, cfg, counters


def test_build_counters_and_lineage(built, code_docs):
    out, cfg, counters = built
    assert counters["n_docs"] == code_docs.count()
    assert counters["docs_tokenized"] == code_docs.count()
    assert counters["blocks_written"] > 0
    man = Manifest(os.path.join(out, "manifest.json"))
    assert len(man.data["buckets"]) == cfg.n_buckets
    assert man.data["lineage"]["input_fingerprint"]


def test_packed_matches_inmemory(spark, built, code_index):
    out, _, _ = built
    pidx = PackedIndex(spark, out)
    # NOTE: code_index has 3 fields; compare on body-only queries
    for model, q in [
        (BM25, "lock free queue"),
        (BM25, "#SUM(ring buffer slot)"),
        (INDRI, "#WAND(0.7 lock 0.2 free 0.1 queue)"),
    ]:
        mem = Engine(code_index, ModelConfig(name=model), tokenizer=CODE_TOKENIZER)
        pak = Engine(pidx, ModelConfig(name=model), tokenizer=CODE_TOKENIZER)
        a = [(r["rank"], r["docid"], r["score"]) for r in mem.search(q, 30).collect()]
        b = [(r["rank"], r["docid"], r["score"]) for r in pak.search(q, 30).collect()]
        assert a == b, (model, q)


def test_heavy_terms_are_salted(spark, built):
    out, cfg, _ = built
    pidx = PackedIndex(spark, out)
    heavy = (
        pidx.term_stats.where(
            (pidx.term_stats.df > cfg.salt_threshold)
            & (pidx.term_stats.field == "body")
        )
        .select("term")
        .first()
    )
    assert heavy is not None, "corpus should contain heavy keyword terms"
    meta = pidx.blocks_meta([(heavy["term"], "body")]).collect()
    salts = sorted({r["salt"] for r in meta})
    assert len(salts) > 1
    # contiguous range salting: docid ranges of different salts don't overlap
    by_salt = {}
    for r in meta:
        lo, hi = by_salt.get(r["salt"], (10**18, -1))
        by_salt[r["salt"]] = (min(lo, r["min_docid"]), max(hi, r["max_docid"]))
    spans = [by_salt[s] for s in salts]
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo


def test_blocks_respect_block_size_and_order(spark, built):
    out, cfg, _ = built
    pidx = PackedIndex(spark, out)
    meta = pidx.packed.limit(2000).collect()
    for r in meta:
        assert 0 < r["n"] <= cfg.block_size
        assert r["min_docid"] <= r["max_docid"]


def _dir_fingerprint(root: str) -> dict:
    """parquet content fingerprint: per table, hash of the sorted row reprs
    (partition/file layout independent)."""
    import hashlib

    import pyarrow.parquet as pq

    out = {}
    for t in ["doc_ids", "doc_stats", "term_stats", "segments", "packed"]:
        files = sorted(glob.glob(f"{root}/{t}/**/*.parquet", recursive=True))
        assert files, f"no parquet under {root}/{t}"
        rows = []
        for f in files:
            tbl = pq.read_table(f)
            cols = sorted(tbl.column_names)
            rows.extend(
                map(repr, zip(*[tbl.column(c).to_pylist() for c in cols]))
            )
        rows.sort()
        out[t] = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    return out


def test_resume_after_injected_failure(spark, code_docs, tmp_path_factory):
    """Kill the build after bucket 1, resume, assert the final index equals a
    never-failed build bit-for-bit (per-table content hashes) and counters
    cover all buckets."""
    base = tmp_path_factory.mktemp("resume")
    cfg_a = BuildConfig(
        out_dir=str(base / "a"), n_buckets=4, block_size=16,
        salt_threshold=40, n_salts=4,
        fields={"body": "content"}, tokenizer=CODE_TOKENIZER,
    )
    build_persistent_index(spark, code_docs, cfg_a)

    cfg_b = BuildConfig(**{**cfg_a.__dict__, "out_dir": str(base / "b")})
    with pytest.raises(RuntimeError, match="injected failure"):
        build_persistent_index(spark, code_docs, cfg_b, fail_after_bucket=1)
    man = Manifest(os.path.join(cfg_b.out_dir, "manifest.json"))
    assert man.bucket_done(0) and man.bucket_done(1)
    assert not man.bucket_done(3)

    counters = build_persistent_index(spark, code_docs, cfg_b, resume=True)
    assert _dir_fingerprint(cfg_a.out_dir) == _dir_fingerprint(cfg_b.out_dir)
    man2 = Manifest(os.path.join(cfg_b.out_dir, "manifest.json"))
    assert all(man2.bucket_done(i) for i in range(4))
    assert counters["blocks_written"] > 0


def test_resume_validates_config_and_input(spark, code_docs, built):
    """Resuming with a changed BuildConfig or a changed corpus must fail
    loudly (ADVICE r01: stale-stage mixing), not silently skip stages."""
    out, cfg, _ = built
    bad_cfg = BuildConfig(**{**cfg.__dict__, "n_buckets": cfg.n_buckets * 2})
    with pytest.raises(ValueError, match="config mismatch"):
        build_persistent_index(spark, code_docs, bad_cfg, resume=True)
    smaller = code_docs.limit(50)
    with pytest.raises(ValueError, match="input mismatch"):
        build_persistent_index(spark, smaller, cfg, resume=True)
    # unchanged config+input: resume is a no-op and keeps counters
    counters = build_persistent_index(spark, code_docs, cfg, resume=True)
    assert counters["blocks_written"] > 0


def test_packed_forward_index_and_prf(spark, built, code_index):
    """doc_terms_for on PackedIndex (decode-on-demand from packed postings)
    must equal the in-memory forward index, and PRF through the packed index
    must produce the identical expansion + ranking (VERDICT r01 item 3)."""
    from search_engine_spark.config import INDRI, ModelConfig
    from search_engine_spark.engine.expand import FbParams, search_expanded

    out, _, _ = built
    pidx = PackedIndex(spark, out)
    ids = [3, 17, 42, 99]
    mem = {
        (r["docid"], r["term"]): (r["tf"], tuple(r["positions"]))
        for r in code_index.doc_terms_for(ids, "body", with_positions=True).collect()
    }
    pak = {
        (r["docid"], r["term"]): (r["tf"], tuple(r["positions"]))
        for r in pidx.doc_terms_for(ids, "body", with_positions=True).collect()
    }
    assert mem and mem == pak

    p = FbParams(fb_docs=4, fb_terms=6, fb_mu=0.0, fb_orig_weight=0.5)
    res_m, learned_m, _ = search_expanded(
        Engine(code_index, ModelConfig(name=INDRI), tokenizer=CODE_TOKENIZER),
        "lock free queue", p, k=15,
    )
    res_p, learned_p, _ = search_expanded(
        Engine(pidx, ModelConfig(name=INDRI), tokenizer=CODE_TOKENIZER),
        "lock free queue", p, k=15,
    )
    assert learned_m == learned_p
    assert [
        (r["rank"], r["docid"], r["score"]) for r in res_m.collect()
    ] == [(r["rank"], r["docid"], r["score"]) for r in res_p.collect()]


def test_driver_side_xxhash_bucket_matches_jvm(spark):
    """_py_bucket (pure-Python XXH64) must equal pmod(F.xxhash64(term), B)
    for every term shape — bucket routing must never drift from the build."""
    import random
    import string

    from pyspark.sql import functions as F

    from search_engine_spark.index.persist import _bucket_col, _py_bucket
    from search_engine_spark.index.xxhash import xxhash64_str

    rng = random.Random(11)
    terms = ["", "a", "def", "x" * 7, "y" * 8, "z" * 31, "w" * 32, "v" * 40,
             "héllo_wörld", "token_✓"]
    terms += [
        "".join(rng.choices(string.ascii_lowercase + "_0123456789", k=rng.randrange(1, 60)))
        for _ in range(150)
    ]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = df.select(
        "term",
        F.xxhash64("term").alias("h"),
        _bucket_col(F.col("term"), 16).alias("b"),
    ).collect()
    for r in rows:
        assert xxhash64_str(r["term"]) == r["h"], r["term"]
        assert _py_bucket(r["term"], 16) == r["b"], r["term"]
