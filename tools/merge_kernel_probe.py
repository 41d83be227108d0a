"""Standalone co-residency probe for the merge kernel (no Spark).

The chain-10 event-log forensics (BENCH_SCALING.md) showed the 1M-file
merge stage's task-seconds inflating 2.06x when four single-core executors
run concurrently — zero fetch wait, zero remote bytes, zero GC — while the
segment stage inflates only 1.18x. This probe isolates the Python/numpy
merge kernel from Spark entirely: it reconstructs real merge shuffle
partitions from an index's surviving `segments/` parquet (same salting +
(term, field, salt) grouping the build applies), then runs the kernel in
P pinned processes on DISTINCT partitions and reports per-partition
throughput at each concurrency. If per-task time inflates with P on
disjoint inputs, the slowdown is memory-system co-residency, not code.

    python tools/merge_kernel_probe.py --index /tmp/bench_scaling/idx_hi \
        --parts 8 --conc 1 4 [--kernel vec|vec_chunked|pandas]

Requires only pyarrow/pandas/numpy. The probe is also the harness for
cache-blocking experiments on the kernel: run it with --kernel variants
and compare both absolute single-process time and the inflation factor.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_partitions(index_dir: str, n_parts: int) -> tuple[list, dict]:
    """Rebuild merge shuffle partitions from segments/ exactly as the build
    does: heavy terms (sum df > salt_threshold) explode to their overlapping
    salt ranges, everything else gets salt 0, rows group by (term, field,
    salt) and groups hash to partitions."""
    man = json.load(open(os.path.join(index_dir, "manifest.json")))
    lin = man["lineage"]
    n_salts, threshold = lin["n_salts"], lin["salt_threshold"]
    max_docid = lin["n_docs"]

    files = sorted(glob.glob(os.path.join(index_dir, "segments", "terms-*.parquet")))
    cols = ["term", "field", "n", "min_docid", "max_docid",
            "docids", "tfs", "doclens", "positions"]
    tbl = pa.concat_tables([pq.read_table(f, columns=cols) for f in files])

    term = np.asarray(tbl.column("term").to_pylist(), dtype=object)
    field = np.asarray(tbl.column("field").to_pylist(), dtype=object)
    n = tbl.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    mind = tbl.column("min_docid").to_numpy(zero_copy_only=False).astype(np.int64)
    maxd = tbl.column("max_docid").to_numpy(zero_copy_only=False).astype(np.int64)

    # heavy terms: sum of per-segment df over (term, field) > threshold
    df_sum: dict = {}
    for t, f, k in zip(term, field, n):
        df_sum[(t, f)] = df_sum.get((t, f), 0) + int(k)
    heavy = {t for (t, f), v in df_sum.items() if v > threshold}

    salted = np.array([t in heavy for t in term], dtype=bool)
    salt_lo = (mind * n_salts) // (max_docid + 1)
    salt_hi = (maxd * n_salts) // (max_docid + 1)

    # explode heavy rows across their salt span (build_persistent_index's
    # F.explode(F.sequence(salt_lo, salt_hi)))
    idx, salts = [], []
    for i in range(len(term)):
        if salted[i]:
            for s in range(int(salt_lo[i]), int(salt_hi[i]) + 1):
                idx.append(i)
                salts.append(s)
        else:
            idx.append(i)
            salts.append(0)
    idx = np.array(idx, dtype=np.int64)
    salts = np.array(salts, dtype=np.int64)

    def part_of(t: str, f: str, s: int) -> int:
        h = hashlib.md5(f"{t}\x00{f}\x00{s}".encode()).digest()
        return int.from_bytes(h[:4], "little") % n_parts

    pids = np.array(
        [part_of(term[i], field[i], int(s)) for i, s in zip(idx, salts)],
        dtype=np.int64,
    )

    exploded = tbl.take(pa.array(idx)).append_column(
        "salt", pa.array(salts.astype(np.int32))
    ).append_column("salted", pa.array(salted[idx]))

    parts = []
    for p in range(n_parts):
        sel = np.flatnonzero(pids == p)
        parts.append(exploded.take(pa.array(sel)))
    meta = {"n_salts": n_salts, "max_docid": max_docid,
            "block_size": lin["block_size"],
            "postings": [int(t.column("n").to_numpy(zero_copy_only=False).sum())
                         for t in parts]}
    return parts, meta


def run_one(kernel: str, chunk: int, part_file: str, meta: dict, cpu: int, out_q) -> None:
    os.sched_setaffinity(0, {cpu})
    from search_engine_spark.index.persist import (
        make_merge_partition,
        make_merge_partition_vec,
    )

    if kernel == "vec":
        fn = make_merge_partition_vec(
            meta["n_salts"], meta["max_docid"], meta["block_size"], chunk
        )
    else:
        fn = make_merge_partition(
            meta["n_salts"], meta["max_docid"], meta["block_size"]
        )
    tbl = pq.read_table(part_file)
    batches = tbl.to_batches(max_chunksize=8192)
    t0 = time.monotonic()
    rows = 0
    for rb in fn(iter(batches)):
        rows += rb.num_rows
    out_q.put((time.monotonic() - t0, rows))


def main() -> None:
    # same glibc pinning get_spark applies to python workers (session.py):
    # without it, this host's stochastically slow first-touch mmap faulting
    # dominates the kernel's large temps and the probe measures the
    # allocator, not the kernel. Children inherit via the environment.
    for env_k in ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_"):
        os.environ.setdefault(env_k, "1073741824")

    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default="/tmp/bench_scaling/idx_hi")
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--conc", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--kernel", default="vec")
    ap.add_argument("--chunk", type=int, default=0,
                    help="vec kernel chunk_postings (0 = whole partition)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/merge_kernel_probe")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    stamp = os.path.join(args.workdir, f"parts{args.parts}.done")
    if not os.path.exists(stamp):
        print("building partitions from", args.index, flush=True)
        parts, meta = load_partitions(args.index, args.parts)
        for p, t in enumerate(parts):
            pq.write_table(t, os.path.join(args.workdir, f"part-{p}.parquet"))
        json.dump(meta, open(os.path.join(args.workdir, "meta.json"), "w"))
        open(stamp, "w").write("ok")
    meta = json.load(open(os.path.join(args.workdir, "meta.json")))
    print("postings per partition:", meta["postings"], flush=True)

    ctx = mp.get_context("spawn")
    results = {}
    for conc in args.conc:
        best = None
        for r in range(args.repeats):
            q = ctx.Queue()
            procs = []
            for i in range(conc):
                pf = os.path.join(args.workdir, f"part-{i % args.parts}.parquet")
                procs.append(ctx.Process(
                    target=run_one, args=(args.kernel, args.chunk, pf, meta, i, q)))
            t0 = time.monotonic()
            for p in procs:
                p.start()
            times = [q.get() for _ in procs]
            for p in procs:
                p.join()
            wall = time.monotonic() - t0
            per = [t for t, _ in times]
            post = sum(meta["postings"][i % args.parts] for i in range(conc))
            rate = post / wall
            print(f"kernel={args.kernel} chunk={args.chunk} conc={conc} rep={r} wall={wall:.2f}s "
                  f"per-task={['%.2f' % t for t in per]} "
                  f"aggregate={rate/1e6:.2f}M postings/s", flush=True)
            if best is None or wall < best[0]:
                best = (wall, rate, per)
        results[conc] = best
    if len(args.conc) >= 2:
        lo, hi = args.conc[0], args.conc[-1]
        # per-task mean inflation on best reps
        mlo = sum(results[lo][2]) / len(results[lo][2])
        mhi = sum(results[hi][2]) / len(results[hi][2])
        print(json.dumps({
            "metric": "merge_kernel_coresidency",
            "kernel": args.kernel,
            "chunk": args.chunk,
            "conc": args.conc,
            "per_task_mean_sec": {str(c): round(sum(r[2]) / len(r[2]), 3)
                                  for c, r in results.items()},
            "aggregate_mpostings_per_sec": {str(c): round(r[1] / 1e6, 3)
                                            for c, r in results.items()},
            "per_task_inflation": round(mhi / mlo, 3),
        }))


if __name__ == "__main__":
    main()
