#!/usr/bin/env python
"""spark-submit entry: index maintenance — delete documents and compact.

    # tombstone docs (O(tombstones) metadata write; no posting touched)
    spark-submit --py-files search_engine_spark.zip jobs/maintain_index.py \
        delete --index /data/index_v1 --ext-ids repo:path@commit ...

    # purge tombstones + refresh stats (work ∝ blocks the deletes touch)
    spark-submit --py-files search_engine_spark.zip jobs/maintain_index.py \
        compact --index /data/index_v1

Completes the index lifecycle next to build (jobs/build_index.py) and
append (jobs/update_index.py): delete masks docs Lucene-style (live
numDocs N, stale df/ctf until merge — hw5/QryEval/InvList.java:84-86's
liveDocs contract), compact is the merge that makes the stats fresh again.
Prints one JSON line with the committed counters.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("delete", help="tombstone documents")
    d.add_argument("--index", required=True)
    d.add_argument("--ext-ids", nargs="*", default=[], help="external ids (repo:path@commit)")
    d.add_argument("--docids", nargs="*", type=int, default=[], help="internal docids")
    d.add_argument("--ext-ids-file", help="file with one external id per line")

    c = sub.add_parser("compact", help="purge tombstones, refresh stats")
    c.add_argument("--index", required=True)

    for p in (d, c):
        p.add_argument("--cores", type=int,
                       default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
        p.add_argument("--master")

    args = ap.parse_args()
    spark = get_spark("maintain_index", cores=args.cores, master=args.master)
    t0 = time.time()

    if args.cmd == "delete":
        from search_engine_spark.index.deletes import delete_docs

        ext = list(args.ext_ids)
        if args.ext_ids_file:
            with open(args.ext_ids_file) as f:
                ext += [ln.strip() for ln in f if ln.strip()]
        entry = delete_docs(
            spark, args.index,
            docids=args.docids or None, ext_docids=ext or None,
        )
    else:
        from search_engine_spark.index.compact import compact_index

        entry = compact_index(spark, args.index)

    print(json.dumps({"cmd": args.cmd, "sec": round(time.time() - t0, 2), **entry}))


if __name__ == "__main__":
    main()
