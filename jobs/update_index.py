#!/usr/bin/env python
"""spark-submit entry: incrementally append new documents to a built index.

    spark-submit --py-files search_engine_spark.zip jobs/update_index.py \
        --index /data/index_v1 --input /data/new_files.parquet

O(delta) work: a delta build into a staging dir + an atomic graft
(index/append.py) — the base packed files never rewrite. Docids continue
the base assignment (with_docids(base=N)); the BuildConfig is reconstructed
from the base manifest's config echo, so the appended generation can never
drift on analyzer/buckets/blocks/salts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.corpus import distributed_corpus_df, with_docids  # noqa: E402
from search_engine_spark.index.append import append_to_index  # noqa: E402
from search_engine_spark.index.persist import BuildConfig, Manifest  # noqa: E402
from search_engine_spark.session import get_spark  # noqa: E402
from search_engine_spark.tokenize import tokenizer_by_name  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True, help="existing index dir")
    ap.add_argument("--input", help="parquet of new (repo,path,commit,lang,content)")
    ap.add_argument("--synthetic", type=int, help="append N synthetic files instead")
    ap.add_argument("--seed", type=int, default=1042)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--no-ext-check", action="store_true",
                    help="skip the ext_docid-uniqueness scan of the base")
    args = ap.parse_args()

    spark = get_spark("update_index", cores=args.cores)
    man = Manifest(os.path.join(args.index, "manifest.json"))
    lin = man.data["lineage"]
    n_base = int(lin["n_docs"])
    cfg = BuildConfig(
        out_dir=args.index,
        n_buckets=int(lin["n_buckets"]),
        block_size=int(lin["block_size"]),
        salt_threshold=int(lin["salt_threshold"]),
        n_salts=int(lin["n_salts"]),
        fields={"body": "content"},
        tokenizer=tokenizer_by_name(lin["tokenizer"]),
    )
    if sorted(cfg.fields) != lin["fields"]:
        raise SystemExit(
            f"base index was built with fields {lin['fields']} — this job "
            "appends the (repo,path,commit,lang,content) corpus shape only"
        )

    if args.synthetic:
        raw = distributed_corpus_df(spark, args.synthetic, args.seed, partitions=32)
    else:
        raw = spark.read.parquet(args.input)
    docs = with_docids(raw, base=n_base)

    t0 = time.time()
    entry = append_to_index(
        spark, docs, cfg, check_ext_unique=not args.no_ext_check
    )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "job": "update_index",
                "wall_sec": round(wall, 3),
                "files_appended": entry["n_docs"],
                "files_per_sec": round(entry["n_docs"] / wall, 2) if wall else None,
                "generation": entry["generation"],
                "blocks_appended": entry["blocks"],
                "n_docs_total": n_base + entry["n_docs"],
                "cores": args.cores,
            }
        )
    )


if __name__ == "__main__":
    main()
