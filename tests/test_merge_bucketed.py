"""Shuffle-free bucketed merge (merge_strategy="bucketed") identity and
resume behavior.

The bucketed strategy routes segment term rows into per-merge-bucket files
at WRITE time (crc32(term) % merge_buckets) so the merge phase can read
each bucket's files directly in one python task — no repartition, no
shuffle-map pass. The packed index must be IDENTICAL (as a row set, all
columns including the binary streams) to the shuffle strategy's: the merge
kernel is deterministic per (term, field, salt) group and routing only
changes which task a group lands in.

Covers: full five-table fingerprint identity (salting active), salt
explode parity (numpy _salt_explode_table vs the JVM withColumn/F.explode
plan — both integer-div), crash-before-merge resume, dispatch-on-side-
manifest (a shuffle-written segments dir never takes the bucketed path),
and the unrouted-file guard.
"""

from __future__ import annotations

import os
import shutil

import pytest

from search_engine_spark.index.persist import (
    BuildConfig,
    Manifest,
    _bucketed_merge,
    _side_manifest,
    build_persistent_index,
)
from search_engine_spark.tokenize import CODE_TOKENIZER

from tests.test_index_format import _dir_fingerprint


def _cfg(out: str, strategy: str, **kw) -> BuildConfig:
    # salt_threshold=40 on the 120-doc corpus -> heavy keywords ARE salted,
    # so the numpy salt explode is exercised, not just the salt=0 path
    return BuildConfig(
        out_dir=out, n_buckets=4, block_size=16, salt_threshold=40,
        n_salts=4, fields={"body": "content"}, tokenizer=CODE_TOKENIZER,
        merge_strategy=strategy, merge_buckets=8, **kw
    )


@pytest.fixture(scope="module")
def both_builds(spark, code_docs, tmp_path_factory):
    roots = {}
    for strat in ("shuffle", "bucketed"):
        out = str(tmp_path_factory.mktemp("mbidx") / strat)
        build_persistent_index(spark, code_docs, _cfg(out, strat))
        roots[strat] = out
    return roots


def _listed_fingerprint(root: str, names: list) -> str:
    """Row-set fingerprint of the manifest-LISTED segment files only (the
    bucketed layout adds termstat-partial side files by design)."""
    import hashlib

    import pyarrow.parquet as pq

    rows = []
    for f in names:
        tbl = pq.read_table(os.path.join(root, "segments", f))
        cols = sorted(tbl.column_names)
        rows.extend(map(repr, zip(*[tbl.column(c).to_pylist() for c in cols])))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def test_bucketed_identical_to_shuffle(both_builds):
    fp_s = _dir_fingerprint(both_builds["shuffle"])
    fp_b = _dir_fingerprint(both_builds["bucketed"])
    for t in ("doc_ids", "doc_stats", "term_stats", "packed"):
        assert fp_s[t] == fp_b[t], f"{t} differs between merge strategies"
    # segment ROWS identical too — routing only changes file/row-group
    # placement (whole-dir hashing would see the termstat side files)
    fps = []
    for strat in ("shuffle", "bucketed"):
        man = _side_manifest(f"{both_builds[strat]}/segments")
        fps.append(
            _listed_fingerprint(
                both_builds[strat], man["files"] + man["marker_files"]
            )
        )
    assert fps[0] == fps[1], "segment rows differ between merge strategies"


def test_bucketed_layout_and_manifest(both_builds):
    import pyarrow.parquet as pq

    out = both_builds["bucketed"]
    man = _side_manifest(f"{out}/segments")
    assert man["merge_buckets"] == 8
    assert man["files"], "no term files committed"
    # same file count/naming as the shuffle strategy — routing lives in
    # row groups, not in a small-file explosion
    assert set(man["rg_buckets"]) == set(man["files"])
    buckets = set()
    for f in man["files"]:
        m = man["rg_buckets"][f]
        pf = pq.ParquetFile(os.path.join(out, "segments", f))
        assert pf.metadata.num_row_groups == len(m["rg_keys"])
        assert [pf.metadata.row_group(i).num_rows
                for i in range(pf.metadata.num_row_groups)] == m["rg_rows"]
        # row groups are key-exclusive: every term in rg i hashes to key i
        from search_engine_spark.index.persist import _mbucket_of

        for i, k in enumerate(m["rg_keys"]):
            terms = pf.read_row_group(i, columns=["term"]).column(0).to_pylist()
            assert {_mbucket_of(t, man["merge_buckets"]) for t in set(terms)} == {k}
        buckets.update(m["rg_keys"])
    assert len(buckets) > 1  # vocab actually spread over buckets
    pk = _side_manifest(f"{out}/packed")
    assert all(f.startswith("packed-mb") for f in pk["files"])
    # shuffle layout untouched by the change
    man_s = _side_manifest(f"{both_builds['shuffle']}/segments")
    assert "merge_buckets" not in man_s and "rg_buckets" not in man_s


def test_resume_after_crash_before_merge(
    spark, code_docs, tmp_path_factory, both_builds, monkeypatch
):
    """A crash between the segment stage and the merge resumes into the
    SAME bucketed merge (dispatch reads the side manifest, not cfg) and
    produces the identical index."""
    out = str(tmp_path_factory.mktemp("mbidx") / "resume")
    import search_engine_spark.index.persist as P

    def boom(*a, **k):
        raise RuntimeError("injected crash before merge")

    monkeypatch.setattr(P, "_bucketed_merge", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        build_persistent_index(spark, code_docs, _cfg(out, "bucketed"))
    man = Manifest(os.path.join(out, "manifest.json"))
    assert man.stage_done("segments") and not man.stage_done("packed")
    monkeypatch.undo()
    # resume: segments stage skipped, bucketed merge completes
    build_persistent_index(spark, code_docs, _cfg(out, "bucketed"))
    assert _dir_fingerprint(out) == _dir_fingerprint(both_builds["bucketed"])


def test_unrouted_files_are_refused(spark, tmp_path):
    seg_dir = str(tmp_path / "segments")
    os.makedirs(seg_dir)
    with pytest.raises(ValueError, match="no bucket→row-group map"):
        _bucketed_merge(
            spark, seg_dir,
            {"files": ["terms-00000-abc.parquet"], "merge_buckets": 8},
            str(tmp_path / "packed"), [], 4, 100, 16,
        )


def test_salt_explode_table_matches_reference():
    """numpy explode == the reference row-wise expansion, boundaries
    included (a row spanning several salt ranges goes to each)."""
    import numpy as np
    import pyarrow as pa

    from search_engine_spark.index.persist import _salt_explode_table

    max_docid, n_salts = 99, 4  # salt ranges: [0,25) [25,50) [50,75) [75,100)
    rows = [
        ("heavy", 1, 24),    # salts 0..0
        ("heavy", 20, 60),   # salts 0..2 (spans two boundaries)
        ("light", 1, 99),    # unsalted -> salt 0 only
        ("heavy", 75, 99),   # salts 3..3
    ]
    tbl = pa.table(
        {
            "term": [r[0] for r in rows],
            "min_docid": pa.array([r[1] for r in rows], pa.int64()),
            "max_docid": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    out = _salt_explode_table(tbl, ["heavy"], n_salts, max_docid)
    got = sorted(
        zip(
            out.column("term").to_pylist(),
            out.column("min_docid").to_pylist(),
            out.column("salt").to_pylist(),
            out.column("salted").to_pylist(),
        )
    )
    expect = []
    for t, lo_d, hi_d in rows:
        if t == "heavy":
            lo = (lo_d * n_salts) // (max_docid + 1)
            hi = (hi_d * n_salts) // (max_docid + 1)
            expect += [(t, lo_d, s, True) for s in range(lo, hi + 1)]
        else:
            expect.append((t, lo_d, 0, False))
    assert got == sorted(expect)


def test_routing_is_deterministic_and_spread():
    from search_engine_spark.index.persist import _mbucket_of

    terms = [f"tok_{i}" for i in range(500)]
    a = [_mbucket_of(t, 64) for t in terms]
    b = [_mbucket_of(t, 64) for t in terms]
    assert a == b
    assert len(set(a)) > 40  # hash actually spreads
