"""Incremental index append: add new documents to a persisted index in
O(delta) work — no rebuild, no rewrite of existing data.

The reference (like the Lucene index it reads) is a frozen snapshot; the
north-rule deployment is a living corpus: new files arrive and the index
must absorb them without re-merging 100 TB. The design exploits one
invariant the builder already guarantees: **docids are dense and
append-only** (with_docids assigns 1..N at ingest; an appended batch takes
N+1..N+Δ). Every appended posting therefore has a docid strictly greater
than every existing posting's, so a term's merged posting list is exactly
``existing blocks ++ delta blocks`` — the base packed files never change.

Append = a normal delta build + an atomic graft:

1. **delta** — ``build_persistent_index`` over the Δ docs into a staging
   dir (same BuildConfig, validated against the base manifest's config
   echo exactly like resume does). All of the build's own machinery —
   segment pass, salted merge, stats, per-stage checkpoints — is reused,
   sized by Δ, not by the corpus.
2. **graft_docs** — staging doc_ids / doc_stats part-files MOVE into the
   base dirs under deterministic ``append{g}-`` names (idempotent: a redo
   skips files already in place). Harmless if visible early: dimension
   rows for docs that match nothing yet.
3. **graft_packed** — staging packed blocks get ``block_id += hwm`` (the
   base's block-id high-water mark, carried in the side manifest) so
   (term, field, salt, block_id) stays unique across generations, then the
   rewritten files move into ``packed/`` and COMMIT by atomically
   rewriting ``packed/_manifest.json`` (Iceberg-style: unlisted files are
   invisible, so a crash leaves readers on the old file list). Delta salt
   ids are computed over the delta's own docid range — a different basis
   than the base generation's, which is correct because salt is only a
   build-time grouping refinement: every query scans all salts of a term,
   and the block-max pruner keys blocks by the full (term, field, salt,
   block_id) identity.
4. **graft_term_stats** — df/ctf are additive: ``base ∪ delta``
   re-aggregated, written beside the live table, swapped in by rename.
5. **commit** — corpus_stats.json sums updated; manifest lineage advances
   (n_docs, XOR-combinable input fingerprint, an ``appends`` log entry
   with per-append counters: the lineage story the north rule asks for);
   staging removed.

Every step records completion in the base manifest
(``append{g}:<step>``); re-invoking after a crash resumes the same
generation at the first unfinished step (the staging build resumes through
its own manifest). The linearization point is the term_stats swap: before
it, queries see the base corpus exactly (delta blocks are invisible until
the packed manifest commit, and between packed-commit and stats-swap new
postings score with the base df/ctf — the same transient a Lucene
near-real-time reader exhibits mid-refresh). Full-build-vs-append query
equivalence (scores bitwise, df/ctf/corpus stats identical) is asserted in
tests/test_append.py.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.index.persist import (
    PACKED_SCHEMA,
    BuildConfig,
    Manifest,
    _config_echo,
    _side_manifest,
    _write_side_manifest,
    build_persistent_index,
    read_packed,
)


def _stage(man: Manifest, g: int, step: str) -> str:
    return f"append{g}:{step}"


def _move_parts(src_dir: str, dst_dir: str, prefix: str) -> list[str]:
    """Move every parquet part-file from src to dst under deterministic
    names derived from the SOURCE filename (``{prefix}-{src_name}``), so a
    resumed move is truly idempotent: after a crash partway through, the
    remaining sources map to the same targets regardless of which files
    already moved. (Enumeration-index naming would renumber the survivors
    from 0, collide with already-moved targets, and drop their rows.)
    Already-moved targets discovered in dst (source gone) are re-listed so
    the returned name set is complete on resume."""
    names = sorted(
        n for n in os.listdir(src_dir)
        if n.endswith(".parquet") and not n.startswith("_")
    )
    moved = set()
    for n in names:
        dst = f"{prefix}-{n}"
        target = os.path.join(dst_dir, dst)
        if not os.path.exists(target):
            os.replace(os.path.join(src_dir, n), target)
        else:
            # same source name already moved by a crashed prior attempt —
            # the rename is the identity map, so the content is in place
            os.remove(os.path.join(src_dir, n))
        moved.add(dst)
    # resume completeness: targets whose source already moved in a prior
    # crashed attempt are part of this generation's file set too
    for n in os.listdir(dst_dir):
        if n.startswith(f"{prefix}-") and n.endswith(".parquet"):
            moved.add(n)
    return sorted(moved)


def _next_generation(man: Manifest) -> int:
    """Resume an unfinished append generation if one exists, else start the
    next one after the committed log."""
    done = len(man.data["lineage"].get("appends", []))
    g = done + 1
    # an earlier crash may have left generation g partially staged — the
    # stage keys tell us; committed generations moved into the appends log
    return g


def append_to_index(
    spark: SparkSession,
    docs: DataFrame,
    cfg: BuildConfig,
    check_ext_unique: bool = True,
    fail_after_step: str | None = None,
) -> dict:
    """Append ``docs`` (docid, ext_docid + cfg.fields source columns, with
    docids dense from n_base+1) to the index at ``cfg.out_dir``. Returns the
    committed append's counters. ``fail_after_step`` injects a crash after
    that step commits (resume test only)."""
    out = cfg.out_dir
    man = Manifest(os.path.join(out, "manifest.json"))
    lin = man.data["lineage"]
    if not (man.stage_done("segments") and man.stage_done("packed")):
        raise ValueError(f"{out} is not a completed index — build first")
    if _side_manifest(f"{out}/packed") is None:
        raise ValueError(
            "append requires the manifest-listed packed layout "
            "(legacy bucket=<b>/ indexes predate the atomic file-list commit)"
        )
    echo = _config_echo(cfg)
    mism = [k for k, v in echo.items() if lin.get(k) != v]
    if mism:
        raise ValueError(
            "append config mismatch vs base manifest: "
            + ", ".join(f"{k}: base={lin.get(k)!r} now={echo[k]!r}" for k in mism)
        )

    n_base = int(lin["n_docs"])
    g = _next_generation(man)
    staging = os.path.join(out, f"append-{g}-staging")
    t0 = time.time()

    # ---- docid contract + delta lineage (one tiny agg) -------------------
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("docid").alias("lo"),
        F.max("docid").alias("hi"),
        F.bit_xor(F.xxhash64("ext_docid")).alias("fp"),
    ).first()
    n_delta = int(row["n"])
    if n_delta == 0:
        raise ValueError("empty append batch")
    if int(row["lo"]) != n_base + 1 or int(row["hi"]) != n_base + n_delta:
        raise ValueError(
            f"append docids must be dense {n_base + 1}..{n_base + n_delta}; "
            f"got [{row['lo']}, {row['hi']}] over {n_delta} docs — assign "
            f"them with with_docids(docs, base={n_base})"
        )
    fp_delta = int(row["fp"])
    if check_ext_unique:
        # only the BASE docid range counts: a resumed append re-checks after
        # its own doc_ids rows may already have grafted in (crash between
        # graft_docs and commit)
        base_ids = spark.read.parquet(f"{out}/doc_ids").where(
            F.col("docid") <= n_base
        )
        dup = (
            base_ids.join(docs.select("ext_docid").distinct(), "ext_docid")
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "append batch re-uses ext_docids already in the index "
                "(pass check_ext_unique=False to allow duplicates knowingly)"
            )

    # ---- step 1: delta build into staging (resumable on its own) ---------
    if not man.stage_done(_stage(man, g, "delta")):
        build_persistent_index(
            spark, docs, replace(cfg, out_dir=staging), resume=True
        )
        man.mark_stage(_stage(man, g, "delta"))
    if fail_after_step == "delta":
        raise RuntimeError("injected failure after step delta")

    # ---- step 2: graft doc_ids + doc_stats -------------------------------
    if not man.stage_done(_stage(man, g, "graft_docs")):
        for d in ("doc_ids", "doc_stats"):
            _move_parts(f"{staging}/{d}", f"{out}/{d}", f"append{g}-{d}")
            if fail_after_step == f"moved_{d}":
                raise RuntimeError(f"injected failure after step moved_{d}")
        man.mark_stage(_stage(man, g, "graft_docs"))
    if fail_after_step == "graft_docs":
        raise RuntimeError("injected failure after step graft_docs")

    # ---- step 3: graft packed blocks (atomic manifest commit) ------------
    pk_dir = f"{out}/packed"
    pk_man = _side_manifest(pk_dir)
    if not man.stage_done(_stage(man, g, "graft_packed")) and any(
        n.startswith(f"append{g}-") for n in pk_man["files"]
    ):
        # crash landed between the side-manifest commit and the stage mark:
        # the files ARE committed — only the mark is missing
        man.mark_stage(
            _stage(man, g, "graft_packed"),
            blocks_appended=int(_side_manifest(f"{staging}/packed")["total_rows"]),
        )
    if not man.stage_done(_stage(man, g, "graft_packed")):
        # block-id high-water mark: recorded by a prior append, else bounded
        # from the base term_stats (a group emits <= ceil(df / block_size)
        # blocks, so max(df) bounds every generation-0 block id)
        hwm = pk_man.get("block_id_hwm")
        if hwm is None:
            r = (
                spark.read.parquet(f"{out}/term_stats")
                .agg(F.max("df").alias("m"))
                .first()
            )
            hwm = int(-(-int(r["m"] or 0) // cfg.block_size)) + 1
        # uncommitted orphans from a crashed attempt are invisible (not in
        # the file list) — drop and redo deterministically
        for n in os.listdir(pk_dir):
            if n.startswith(f"append{g}-"):
                os.remove(os.path.join(pk_dir, n))
        delta_packed, _ = read_packed(spark, staging)
        off_dir = f"{staging}/packed_offset"
        shutil.rmtree(off_dir, ignore_errors=True)
        offset = delta_packed.withColumn(
            "block_id", (F.col("block_id") + F.lit(int(hwm))).cast("int")
        )
        delta_hwm = offset.agg(F.max("block_id").alias("m")).first()["m"]
        (
            offset.sortWithinPartitions("term", "field", "salt", "block_id")
            .write.mode("overwrite").parquet(off_dir)
        )
        moved = _move_parts(off_dir, pk_dir, f"append{g}-packed")
        delta_rows = int(_side_manifest(f"{staging}/packed")["total_rows"])
        _write_side_manifest(
            pk_dir,
            {
                **pk_man,
                "files": sorted(pk_man["files"] + moved),
                "total_rows": int(pk_man["total_rows"]) + delta_rows,
                "block_id_hwm": int(delta_hwm) + 1,
            },
        )
        man.mark_stage(
            _stage(man, g, "graft_packed"), blocks_appended=delta_rows
        )
    if fail_after_step == "graft_packed":
        raise RuntimeError("injected failure after step graft_packed")

    # ---- step 4: merged term_stats, swapped in by rename ------------------
    # Crash-safe state machine: the OLD table is renamed aside (never
    # rmtree'd) before the merged table swaps in, so "swap already done" is
    # detectable on resume — old present + tmp absent can ONLY mean the
    # merge ran and swapped but the stage mark didn't land. Without the
    # rename, that crash window is indistinguishable from "not yet merged"
    # and a resume would re-merge against the already-merged table, adding
    # the delta's df/ctf a second time.
    ts_dir = f"{out}/term_stats"
    tmp_dir = f"{out}/term_stats-append{g}.tmp"
    old_dir = f"{out}/term_stats-append{g}.old"
    if not man.stage_done(_stage(man, g, "graft_term_stats")):
        if os.path.exists(old_dir) and not os.path.exists(tmp_dir):
            pass  # swap completed before a crash: ts_dir IS the merged table
        else:
            if not os.path.exists(os.path.join(tmp_dir, "_SUCCESS")):
                # absent or partially-written tmp (no _SUCCESS): (re)merge.
                # df/ctf are additive across generations; bucket is a pure
                # function of the term, F.max keeps it through re-aggregation
                shutil.rmtree(tmp_dir, ignore_errors=True)
                merged = (
                    spark.read.parquet(ts_dir)
                    .unionByName(spark.read.parquet(f"{staging}/term_stats"))
                    .groupBy("term", "field")
                    .agg(
                        F.sum("df").cast("long").alias("df"),
                        F.sum("ctf").cast("long").alias("ctf"),
                        F.max("bucket").alias("bucket"),
                    )
                )
                merged.write.parquet(tmp_dir)
            if fail_after_step == "ts_merged":
                raise RuntimeError("injected failure after step ts_merged")
            if os.path.exists(ts_dir):
                shutil.rmtree(old_dir, ignore_errors=True)
                os.replace(ts_dir, old_dir)
            if fail_after_step == "ts_renamed":
                raise RuntimeError("injected failure after step ts_renamed")
            os.replace(tmp_dir, ts_dir)
            if fail_after_step == "ts_swapped":
                raise RuntimeError("injected failure after step ts_swapped")
        man.mark_stage(_stage(man, g, "graft_term_stats"))
    # only after the stage mark is durable is the old table disposable
    shutil.rmtree(old_dir, ignore_errors=True)
    if fail_after_step == "graft_term_stats":
        raise RuntimeError("injected failure after step graft_term_stats")

    # ---- step 5: corpus stats + lineage commit, staging cleanup ----------
    with open(f"{staging}/corpus_stats.json") as f:
        delta_stats = json.load(f)
    with open(f"{out}/corpus_stats.json") as f:
        base_stats = json.load(f)
    by_field = dict(base_stats["by_field"])
    for fld, dsf in delta_stats["by_field"].items():
        b = by_field.get(fld, {"n_docs": 0, "sum_doclen": 0})
        n_f = b["n_docs"] + dsf["n_docs"]
        len_f = b["sum_doclen"] + dsf["sum_doclen"]
        by_field[fld] = {
            "n_docs": n_f,
            "sum_doclen": len_f,
            "avgdl": len_f / n_f if n_f else 0.0,
        }
    new_stats = {"n_docs": n_base + n_delta, "by_field": by_field}
    tmp = f"{out}/corpus_stats.json.tmp"
    with open(tmp, "w") as f:
        json.dump(new_stats, f, indent=1)
    os.replace(tmp, f"{out}/corpus_stats.json")

    # XOR-combinable fingerprint: bit_xor(xxhash64(ext)) over the union is
    # the XOR of the parts. Kept in the builder's signed-int64 hex
    # convention (f"{spark_long:x}") so the combined value equals what a
    # one-shot build over the union would have recorded.
    def _signed_hex(v: int) -> str:
        v &= 2**64 - 1
        return f"{v - 2**64 if v >= 2**63 else v:x}"

    fp_base = lin.get("input_fingerprint")
    fp_new = (
        _signed_hex(int(fp_base, 16) ^ fp_delta)
        if fp_base not in (None, "empty")
        else _signed_hex(fp_delta)
    )
    entry = {
        "generation": g,
        "n_docs": n_delta,
        "blocks": man.data["stages"][_stage(man, g, "graft_packed")].get(
            "blocks_appended"
        ),
        "fingerprint": _signed_hex(fp_delta),
        "sec": round(time.time() - t0, 2),
        "ts": time.time(),
    }
    man.set_lineage(
        n_docs=n_base + n_delta,
        input_fingerprint=fp_new,
        appends=lin.get("appends", []) + [entry],
    )
    man.mark_stage(_stage(man, g, "commit"), docs_appended=n_delta)
    shutil.rmtree(staging, ignore_errors=True)
    return entry
