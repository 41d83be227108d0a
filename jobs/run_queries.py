#!/usr/bin/env python
"""spark-submit entry: answer queries against a persisted index, TREC output.

    spark-submit --py-files search_engine_spark.zip jobs/run_queries.py \
        --index /data/index_v1 --model BM25 \
        --queries queries.txt --out run.trec [--pruned]

``queries.txt``: reference format, one ``qid:querytext`` per line
(hw5/QryEval/QryEval.java:659-673). ``--pruned`` uses the block-max pruned
path for flat BM25 BOW queries (identical results, fewer blocks scanned).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.config import BM25, ModelConfig  # noqa: E402
from search_engine_spark.engine.pruning import bm25_topk_pruned  # noqa: E402
from search_engine_spark.engine.runner import Engine  # noqa: E402
from search_engine_spark.engine.topk import trec_lines  # noqa: E402
from search_engine_spark.index.persist import PackedIndex  # noqa: E402
from search_engine_spark.session import get_spark  # noqa: E402
from search_engine_spark.tokenize import CODE_TOKENIZER  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--model", default=BM25)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--pruned", action="store_true")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    spark = get_spark("run_queries", cores=args.cores)
    pidx = PackedIndex(spark, args.index)
    eng = Engine(pidx, ModelConfig(name=args.model), tokenizer=CODE_TOKENIZER)

    with open(args.queries) as f:
        pairs = [
            line.strip().split(":", 1) for line in f if line.strip()
        ]

    t0 = time.time()
    lines: list[str] = []
    per_q = {}
    for qid, text in pairs:
        tq = time.time()
        toks = CODE_TOKENIZER.tokenize(text)
        if args.pruned and args.model == BM25 and "#" not in text:
            rows = [r.asDict() for r in bm25_topk_pruned(pidx, toks, args.k).collect()]
        else:
            rows = [r.asDict() for r in eng.search(text, args.k).collect()]
        lines.extend(trec_lines(qid, rows))
        per_q[qid] = round(time.time() - tq, 3)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(
        json.dumps(
            {
                "job": "run_queries",
                "wall_sec": round(time.time() - t0, 3),
                "n_queries": len(pairs),
                "per_query_sec": per_q,
                "out": args.out,
            }
        )
    )


if __name__ == "__main__":
    main()
