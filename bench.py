#!/usr/bin/env python
"""Round benchmark: index-build throughput + headline query latencies.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the end-to-end wall time (index build + all headline queries).
Extra keys record index-build files/sec. The north-rule two-parallelism-level
scaling evidence is produced by ``tools/bench_scaling.py`` (fresh JVM per
level, optional ``--warmup-files`` steady-state mode) and recorded with full
history in ``BENCH_SCALING.md``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from search_engine_spark import driver_queries as dq  # noqa: E402
from search_engine_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "term_postings",
    "bm25_sum_topk",
    "bm25_sum_scores_all",
    "unranked_and_topk",
    "ranked_and_scores",
    "ranked_or_scores",
    "syn_postings",
    "near2_postings",
    "window8_postings",
    "indri_and_topk",
    "indri_wand_topk",
    "indri_wsum_topk",
    "prf_term_weights",
    "letor_rerank_topk",
    "prospective_match",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    spark = get_spark("bench", cores=cpus)
    t_start = time.time()

    # headline build = the PRODUCTION persistent path (segment pass + merge
    # + stats -> PackedIndex); rank-identical to the in-memory path
    # (tests/test_index_format.py). At sf0.1's 5,000 docs the wall is
    # dominated by fixed per-job costs — the at-scale throughput evidence
    # is BENCH_SCALING.md (100k files: ~1,500 files/s at 1 core, ~4,000 at
    # 4 cores on the same input).
    t0 = time.time()
    pidx = dq.load_packed_documents_index(spark, sf_dir)
    n_files = pidx.corpus.n_docs
    packed_build_sec = time.time() - t0

    # queries run against the in-memory index (the correctness-gate path,
    # comparable to r01's latencies; the packed query side is exercised by
    # the pytest rank-identity suite)
    dq.USE_PACKED = False
    t0 = time.time()
    dq.load_documents_index(spark, sf_dir)
    inmem_build_sec = time.time() - t0

    queries = dq.all_queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        queries[name](spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)

    total = time.time() - t_start
    out = {
        "metric": "index_build_plus_headline_queries",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_files": n_files,
        "index_build_sec": round(packed_build_sec, 3),
        "index_files_per_sec": (
            round(n_files / packed_build_sec, 1) if packed_build_sec else None
        ),
        "inmem_build_sec": round(inmem_build_sec, 3),
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
