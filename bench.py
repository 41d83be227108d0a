#!/usr/bin/env python
"""Round benchmark: index-build throughput + headline query latencies.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the end-to-end wall time (index build + all headline queries).
Extra keys record the north-rule numbers: index-build files/sec and, when
``--scaling`` is passed, the same build at two parallelism levels with the
scaling efficiency (see tools/bench_scaling.py for the driver-independent
two-level run).
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    # the bench runs the PRODUCTION build path: persistent segment-
    # architecture index + PackedIndex query side (rank-identical to the
    # in-memory path — tests/test_index_format.py)
    dq.USE_PACKED = os.environ.get("SPARK_GRAFT_PACKED", "1") == "1"

    spark = get_spark("bench", cores=cpus)
    t_start = time.time()

    # index build (segment pass + merge + stats), timed end-to-end
    t0 = time.time()
    idx = dq.load_documents_index(spark, sf_dir)
    n_files = idx.corpus.n_docs
    build_sec = time.time() - t0

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
        "index_build_sec": round(build_sec, 3),
        "index_files_per_sec": round(n_files / build_sec, 1) if build_sec else None,
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
