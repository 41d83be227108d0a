"""Standalone co-residency probe for shuffle compression codecs (no Spark).

Chain-12 event-log forensics (BENCH_SCALING.md) showed the 1M-file merge
shuffle-MAP stage — segment scan + salt explode + shuffle WRITE — regressing
absolutely when four single-core executors run concurrently (18.2 s -> 27.5 s
wall, JVM CPU x5.6 on identical bytes, zero fetch-wait/GC). The suspect is
the shuffle-write compressor on this host's degraded-DRAM windows. This
probe isolates the codec exactly as tools/merge_kernel_probe.py isolates the
merge kernel: P pinned processes each stream-compress the SAME real segment
payload in 32 KiB blocks (Spark's shuffle writer buffer size), and we
compare per-task throughput at conc=1 vs conc=4. If per-byte cost inflates
with P on disjoint working sets, the slowdown is memory-system co-residency,
not codec CPU.

    python tools/compress_probe.py --index /tmp/bench_scaling/idx_hi \
        --codecs zstd lz4 --conc 1 4 --mb 256

Requires only pyarrow/numpy. zstd runs at compression_level=1 to mirror
Spark's `spark.io.compression.zstd.level` default.
"""

from __future__ import annotations

import argparse
import glob
import json
import multiprocessing as mp
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

BLOCK = 32 * 1024  # spark.io.compression.*.blockSize / zstd bufferSize default


def load_payload(index_dir: str, cap_mb: int) -> bytes:
    """Concatenate the real posting binaries (docids/tfs/doclens/positions)
    from segments/ — the exact byte stream the merge shuffle moves."""
    files = sorted(glob.glob(os.path.join(index_dir, "segments", "terms-*.parquet")))
    if not files:
        raise SystemExit(f"no segment parquet under {index_dir}/segments")
    out, total, cap = [], 0, cap_mb * 1024 * 1024
    for f in files:
        tbl = pq.read_table(f, columns=["docids", "tfs", "doclens", "positions"])
        for col in tbl.itercolumns():
            for chunk in col.chunks:
                buf = chunk.buffers()[-1]
                if buf is None:
                    continue
                out.append(buf.to_pybytes())
                total += len(out[-1])
                if total >= cap:
                    return b"".join(out)[:cap]
    return b"".join(out)


def run_one(codec_name: str, payload_file: str, cpu: int, passes: int, out_q) -> None:
    os.sched_setaffinity(0, {cpu})
    codec = (
        pa.Codec("zstd", compression_level=1)
        if codec_name == "zstd"
        else pa.Codec(codec_name)
    )
    data = open(payload_file, "rb").read()
    n = len(data)
    # one untimed warmup pass (page-fault the payload + codec contexts)
    for off in range(0, n, BLOCK):
        codec.compress(data[off : off + BLOCK])
    t0 = time.monotonic()
    comp = 0
    for _ in range(passes):
        for off in range(0, n, BLOCK):
            comp += len(codec.compress(data[off : off + BLOCK]))
    dt = time.monotonic() - t0
    out_q.put((dt, n * passes, comp))


def main() -> None:
    # same glibc pinning session.py applies (see merge_kernel_probe.py)
    for env_k in ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_"):
        os.environ.setdefault(env_k, "1073741824")

    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default="/tmp/bench_scaling/idx_hi")
    ap.add_argument("--codecs", nargs="+", default=["zstd", "lz4"])
    ap.add_argument("--conc", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/compress_probe")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    pf = os.path.join(args.workdir, f"payload-{args.mb}mb.bin")
    if not os.path.exists(pf):
        print("extracting payload from", args.index, flush=True)
        open(pf, "wb").write(load_payload(args.index, args.mb))
    size = os.path.getsize(pf)
    print(f"payload {size/1e6:.0f} MB, block {BLOCK//1024} KiB", flush=True)

    ctx = mp.get_context("spawn")
    report = {}
    for codec in args.codecs:
        results = {}
        for conc in args.conc:
            best = None
            for r in range(args.repeats):
                q = ctx.Queue()
                procs = [
                    ctx.Process(target=run_one, args=(codec, pf, i, args.passes, q))
                    for i in range(conc)
                ]
                t0 = time.monotonic()
                for p in procs:
                    p.start()
                times = [q.get() for _ in procs]
                for p in procs:
                    p.join()
                wall = time.monotonic() - t0
                per = [t for t, _, _ in times]
                raw = sum(nb for _, nb, _ in times)
                comp = sum(cb for _, _, cb in times)
                agg = raw / wall / 1e6
                print(
                    f"codec={codec} conc={conc} rep={r} wall={wall:.2f}s "
                    f"per-task={['%.2f' % t for t in per]} aggregate={agg:.0f}MB/s "
                    f"ratio={comp/raw:.3f}",
                    flush=True,
                )
                if best is None or wall < best[0]:
                    best = (wall, agg, per, comp / raw)
            results[conc] = best
        lo, hi = args.conc[0], args.conc[-1]
        mlo = sum(results[lo][2]) / len(results[lo][2])
        mhi = sum(results[hi][2]) / len(results[hi][2])
        report[codec] = {
            "per_task_mean_sec": {str(c): round(sum(r[2]) / len(r[2]), 3)
                                  for c, r in results.items()},
            "aggregate_mb_per_sec": {str(c): round(r[1], 1)
                                     for c, r in results.items()},
            "per_task_inflation": round(mhi / mlo, 3),
            "ratio": round(results[lo][3], 3),
        }
    print(json.dumps({"metric": "compress_coresidency", "block_kib": BLOCK // 1024,
                      "mb": args.mb, "conc": args.conc, "codecs": report}))


if __name__ == "__main__":
    main()
