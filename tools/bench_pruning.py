#!/usr/bin/env python
"""Block-max pruning evidence at scale (VERDICT r03 item 1).

Builds (or reuses) a packed index over the BURSTY synthetic corpus
(corpus.py bursty=True — identifier locality: each repo's org reuses a
4-term theme so heavily that per-doc tf hits 10-60, docid-contiguous
because with_docids orders by repo). That skew is the distribution
block-max pruning was designed for; on the i.i.d. Zipf corpus every
block's (max_tf, min_doclen) bound looks alike and provably nothing can
skip (the r03 13/13 finding).

For each same-theme query (the realistic shape: a user searches related
identifiers) it runs the EXACT single-scan plan and the PRUNED two-phase
plan (engine/pruning.py), asserts bitwise-identical top-k, and reports
blocks scanned vs total plus median wall times. One JSON line per query +
one summary line.

Usage:
    python tools/bench_pruning.py [--n-files 100000] [--block-size 128]
                                  [--k 100] [--reps 3] [--cores 32]
                                  [--out /tmp/bursty_prune_idx]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.config import BM25, ModelConfig  # noqa: E402
from search_engine_spark.corpus import (  # noqa: E402
    distributed_corpus_df,
    theme_terms,
    with_docids,
)
from search_engine_spark.engine.pruning import (  # noqa: E402
    PruneStats,
    bm25_topk_pruned,
)
from search_engine_spark.engine.runner import Engine  # noqa: E402
from search_engine_spark.index.persist import (  # noqa: E402
    BuildConfig,
    Manifest,
    PackedIndex,
    build_persistent_index,
)
from search_engine_spark.session import get_spark  # noqa: E402
from search_engine_spark.tokenize import CODE_TOKENIZER  # noqa: E402

THEMES = [0, 7, 13, 23, 42, 67]


def build_or_reuse(spark, n_files: int, block_size: int, out: str) -> PackedIndex:
    man_path = os.path.join(out, "manifest.json")
    if os.path.exists(man_path):
        man = Manifest(man_path)
        lin = man.data["lineage"]
        if (
            man.stage_done("packed")
            and int(lin.get("n_docs", 0)) == n_files
            and int(lin.get("block_size", 0)) == block_size
        ):
            print(f"[reuse] {out} ({n_files} docs, block_size={block_size})")
            return PackedIndex(spark, out)
    docs = with_docids(distributed_corpus_df(spark, n_files, bursty=True))
    cfg = BuildConfig(
        out_dir=out,
        fields={"body": "content"},
        tokenizer=CODE_TOKENIZER,
        block_size=block_size,
    )
    t0 = time.time()
    build_persistent_index(spark, docs, cfg, resume=True)
    print(f"[build] {n_files} files in {time.time() - t0:.1f}s")
    return PackedIndex(spark, out)


def median_wall(fn, reps: int) -> tuple[float, list]:
    walls, last = [], None
    for _ in range(reps):
        t0 = time.time()
        last = fn()
        walls.append(time.time() - t0)
    return statistics.median(walls), last


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-files", type=int, default=100_000)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default="/tmp/bursty_prune_idx")
    args = ap.parse_args()

    spark = get_spark("bench_pruning", cores=args.cores)
    pidx = build_or_reuse(spark, args.n_files, args.block_size, args.out)
    eng = Engine(pidx, ModelConfig(name=BM25), tokenizer=CODE_TOKENIZER)

    # warmup (JIT/codegen on both plans)
    wq = theme_terms(THEMES[0])[:3]
    bm25_topk_pruned(pidx, wq, k=args.k).collect()
    os.environ["SPARK_GRAFT_NO_PRUNE"] = "1"
    eng.search(" ".join(wq), args.k).collect()
    del os.environ["SPARK_GRAFT_NO_PRUNE"]

    rows = []
    for th in THEMES:
        q = theme_terms(th)[:3]

        os.environ["SPARK_GRAFT_NO_PRUNE"] = "1"
        exact_sec, exact_rows = median_wall(
            lambda: [tuple(r) for r in eng.search(" ".join(q), args.k).collect()],
            args.reps,
        )
        del os.environ["SPARK_GRAFT_NO_PRUNE"]

        st = PruneStats()

        def run_pruned():
            nonlocal st
            st = PruneStats()
            return [
                tuple(r)
                for r in bm25_topk_pruned(pidx, q, k=args.k, stats=st).collect()
            ]

        pruned_sec, pruned_rows = median_wall(run_pruned, args.reps)

        identical = exact_rows == pruned_rows
        row = {
            "theme": th,
            "terms": q,
            "k": args.k,
            "identical": identical,
            "blocks_scanned": st.n_blocks_scanned,
            "blocks_total": st.n_blocks_total,
            "ranges_scanned": st.n_ranges_scanned,
            "ranges_total": st.n_ranges_total,
            "theta": round(st.theta, 3),
            "exact_sec": round(exact_sec, 3),
            "pruned_sec": round(pruned_sec, 3),
        }
        rows.append(row)
        print(json.dumps(row))
        if not identical:
            print(f"IDENTITY FAILURE theme {th}", file=sys.stderr)
            sys.exit(1)

    summary = {
        "metric": "block_max_pruning_evidence",
        "n_files": args.n_files,
        "block_size": args.block_size,
        "k": args.k,
        "cores": args.cores,
        "queries": len(rows),
        "identical_all": all(r["identical"] for r in rows),
        "blocks_scanned_sum": sum(r["blocks_scanned"] for r in rows),
        "blocks_total_sum": sum(r["blocks_total"] for r in rows),
        "skip_pct": round(
            100.0
            * (1 - sum(r["blocks_scanned"] for r in rows) / max(1, sum(r["blocks_total"] for r in rows))),
            1,
        ),
        "exact_sec_median": round(statistics.median([r["exact_sec"] for r in rows]), 3),
        "pruned_sec_median": round(statistics.median([r["pruned_sec"] for r in rows]), 3),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
