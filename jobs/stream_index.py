#!/usr/bin/env python
"""spark-submit entry: incrementally ingest an arrival directory of document
parquet files into index segments via Structured Streaming, optionally
finalizing into the complete packed index.

Cluster usage — run on a schedule (or with a processingTime trigger) against
the landing bucket; each invocation drains only files that arrived since the
last one (the checkpoint tracks processed files):

    spark-submit --py-files search_engine_spark.zip jobs/stream_index.py \
        --input /data/landing/source_code --out /data/index_v1 \
        --buckets 256 --salts 32
    ...                       # more files land, rerun any number of times
    spark-submit ... jobs/stream_index.py --out /data/index_v1 --finalize

Sandbox stand-in: ``--synthetic N --waves K`` writes the deterministic corpus
into the arrival dir in K waves with a drain after each, then finalizes —
one process demonstrating the whole lifecycle.

Prints one JSON line per invocation with ingest wall time and batch counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.corpus import distributed_corpus_df  # noqa: E402
from search_engine_spark.index.persist import BuildConfig, Manifest  # noqa: E402
from search_engine_spark.session import get_spark  # noqa: E402
from search_engine_spark.streaming.ingest import (  # noqa: E402
    finalize_stream_index,
    stream_ingest,
)
from search_engine_spark.tokenize import CODE_TOKENIZER  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="arrival dir of (repo,path,commit,lang,content) parquet")
    ap.add_argument("--synthetic", type=int, help="demo: write N synthetic files in waves")
    ap.add_argument("--waves", type=int, default=3)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--salts", type=int, default=8)
    ap.add_argument("--salt-threshold", type=int, default=100_000)
    ap.add_argument("--block-size", type=int, default=1024)
    ap.add_argument("--max-files-per-trigger", type=int)
    ap.add_argument("--finalize", action="store_true",
                    help="promote streamed segments to the packed index")
    ap.add_argument(
        "--conf", action="append", default=[], metavar="K=V",
        help="extra Spark conf (repeatable)",
    )
    args = ap.parse_args()

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark("stream_index", cores=args.cores, extra_conf=extra)
    cfg = BuildConfig(
        out_dir=args.out,
        n_buckets=args.buckets,
        n_salts=args.salts,
        salt_threshold=args.salt_threshold,
        block_size=args.block_size,
        fields={"body": "content"},
        tokenizer=CODE_TOKENIZER,
    )

    t0 = time.time()
    if args.synthetic:
        arrivals = f"{args.out}__arrivals_{args.synthetic}_{args.seed}"
        docs = distributed_corpus_df(spark, args.synthetic, args.seed, partitions=32)
        from pyspark.sql import functions as F

        for w in range(args.waves):
            docs.where(F.crc32("path") % args.waves == w).write.mode(
                "append"
            ).parquet(arrivals)
            stream_ingest(
                spark, arrivals, cfg,
                max_files_per_trigger=args.max_files_per_trigger,
            )
        args.finalize = True
    elif args.input:
        stream_ingest(
            spark, args.input, cfg,
            max_files_per_trigger=args.max_files_per_trigger,
        )
    if args.finalize:
        finalize_stream_index(spark, cfg)
    wall = time.time() - t0

    man = Manifest(os.path.join(args.out, "manifest.json"))
    st = man.data.get("stream", {})
    n = sum(b["n_docs"] for b in st.get("batches", {}).values())
    print(
        json.dumps(
            {
                "job": "stream_index",
                "wall_sec": round(wall, 3),
                "files_ingested": n,
                "files_per_sec": round(n / wall, 2) if wall else None,
                "batches": len(st.get("batches", {})),
                "finalized": man.stage_done("packed"),
                "cores": args.cores,
            }
        )
    )


if __name__ == "__main__":
    main()
