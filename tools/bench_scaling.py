#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule): the same index build at two
parallelism levels — local[N] and local[4N] as the sandbox stand-in for N-
and 4N-executor clusters — on the SAME synthetic input.

Each level runs in a fresh subprocess (fresh JVM, no warm caches shared).
Efficiency = (throughput@4N / throughput@N) / 4. Writes JSON to stdout and
appends a markdown row to BENCH_SCALING.md.

    python tools/bench_scaling.py --files 20000 --low 8 --high 32

``--pin`` additionally confines each level to exactly that many CPUs via
``taskset``: without it, a ``local[1]`` driver still spreads its JVM GC/IO
threads and python workers over every host core, so the low level free-rides
on extra CPUs and the measured efficiency understates true scaling. Pinning
makes the levels resource-proportional — the faithful stand-in for N- vs
4N-executor clusters, where an executor's JVM *and* python workers share
that executor's cores.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, files: int, out_dir: str, buckets: int, salts: int,
              threshold: int, confs: list[str] | None = None, pin: bool = False,
              executor_cores: int = 0, executor_mem: str = "6g",
              warmup_files: int = 0, merge_partitions: int = 0) -> dict:
    """One build at one parallelism level. ``executor_cores > 0`` switches
    from local[cores] to a standalone cluster of cores/executor_cores
    separate executor JVMs (tools/local_cluster.py) — the faithful stand-in
    for a cluster of that many executors; ``pin`` then tasksets the WORKER
    (hence all executors) to exactly ``cores`` CPUs while the driver floats,
    as on a real cluster where the driver is its own node."""
    shutil.rmtree(out_dir, ignore_errors=True)
    cmd = [
        sys.executable, os.path.join(REPO, "jobs", "build_index.py"),
        "--synthetic", str(files), "--out", out_dir,
        "--cores", str(cores), "--buckets", str(buckets),
        "--salts", str(salts), "--salt-threshold", str(threshold),
    ]
    if warmup_files:
        cmd += ["--warmup-files", str(warmup_files)]
    if merge_partitions:
        cmd += ["--merge-partitions", str(merge_partitions)]
    for kv in confs or []:
        cmd += ["--conf", kv]
    if executor_cores:
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from local_cluster import LocalCluster

        n_exec = max(1, cores // executor_cores)
        mem_gb = int(executor_mem.rstrip("g")) * n_exec + 2
        with LocalCluster(cores=cores, memory_gb=mem_gb, pin_cpus=pin) as url:
            cmd += [
                "--master", url,
                "--conf", f"spark.executor.cores={executor_cores}",
                "--conf", f"spark.executor.memory={executor_mem}",
                "--conf", f"spark.cores.max={cores}",
            ]
            res = subprocess.run(cmd, capture_output=True, text=True, check=True)
    else:
        if pin:
            cmd = ["taskset", "-c", f"0-{cores - 1}" if cores > 1 else "0"] + cmd
        res = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=20000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--salts", type=int, default=8)
    ap.add_argument("--salt-threshold", type=int, default=4000)
    ap.add_argument("--workdir", default="/tmp/bench_scaling")
    ap.add_argument("--repeats", type=int, default=2,
                    help="interleaved repeats per level; best wall time wins "
                         "(this host shows double-digit %% run-to-run noise)")
    ap.add_argument("--conf", action="append", default=[], metavar="K=V",
                    help="extra Spark conf forwarded to both levels (repeatable)")
    ap.add_argument("--pin", action="store_true",
                    help="taskset each level to exactly that many CPUs "
                         "(resource-proportional N vs 4N; see module docstring)")
    ap.add_argument("--executor-cores", type=int, default=0, metavar="C",
                    help="run each level on a standalone cluster of separate "
                         "C-core executor JVMs instead of one local[N] JVM "
                         "(level/C executors; tools/local_cluster.py)")
    ap.add_argument("--executor-mem", default="6g")
    ap.add_argument("--merge-partitions", type=int, default=0,
                    help="override the merge shuffle partition count at BOTH "
                         "levels (0 = engine default of 2x total cores)")
    ap.add_argument("--warmup-files", type=int, default=0, metavar="N",
                    help="untimed N-file build in each level's JVM before "
                         "its timed run (steady-state measurement; see "
                         "jobs/build_index.py --warmup-files)")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    runs: dict[str, list[dict]] = {"lo": [], "hi": []}
    for _ in range(args.repeats):
        runs["lo"].append(
            run_level(args.low, args.files, f"{args.workdir}/idx_lo",
                      args.buckets, args.salts, args.salt_threshold,
                      args.conf, args.pin, args.executor_cores, args.executor_mem,
                      args.warmup_files, args.merge_partitions)
        )
        runs["hi"].append(
            run_level(args.high, args.files, f"{args.workdir}/idx_hi",
                      args.buckets, args.salts, args.salt_threshold,
                      args.conf, args.pin, args.executor_cores, args.executor_mem,
                      args.warmup_files, args.merge_partitions)
        )
    lo = min(runs["lo"], key=lambda r: r["wall_sec"])
    hi = min(runs["hi"], key=lambda r: r["wall_sec"])

    ratio = hi["files_per_sec"] / lo["files_per_sec"]
    eff = ratio / (args.high / args.low)

    # Per-stage decomposition (north_rule alternate evidence): the build's
    # manifest counters time the two pipeline stages — segments (tokenize +
    # partial postings) and buckets (merge + packed write); stats runs
    # overlapped with the merge, so the pipeline wall is approximately
    # segments + max(stats, buckets) and the remainder is the serial
    # orchestration tail (session init, planning, commit). Stage efficiency
    # isolates how the PARALLEL work scales once that constant tail — which
    # a real cluster amortizes over 1000x the input — is excluded.
    def stage_secs(r: dict) -> dict:
        c = r.get("counters", {})
        seg = c.get("segments_sec")
        merge = max(c.get("stats_sec", 0) or 0, c.get("buckets_sec", 0) or 0)
        out = {"segments": seg, "merge": merge or None}
        if seg is not None and merge:
            out["tail"] = round(r["wall_sec"] - seg - merge, 2)
        return out

    lo_st, hi_st = stage_secs(lo), stage_secs(hi)
    stage_eff = {}
    for k in ("segments", "merge"):
        if lo_st.get(k) and hi_st.get(k):
            stage_eff[k] = round((lo_st[k] / hi_st[k]) / (args.high / args.low), 3)
    # report the count the JOB saw, not the request — guards against any
    # corpus-reuse mismatch ever mislabeling a history row again
    n_files = lo.get("files") or args.files
    out = {
        "metric": "index_build_scaling",
        "files": n_files,
        "pinned": args.pin,
        "executor_cores": args.executor_cores,
        "low_cores": args.low,
        "high_cores": args.high,
        "low_files_per_sec": lo["files_per_sec"],
        "high_files_per_sec": hi["files_per_sec"],
        "low_wall_sec": lo["wall_sec"],
        "high_wall_sec": hi["wall_sec"],
        "speedup": round(ratio, 3),
        "scaling_efficiency": round(eff, 3),
        "warmup_files": args.warmup_files,
        "stage_sec_low": lo_st,
        "stage_sec_high": hi_st,
        "stage_efficiency": stage_eff,
    }
    print(json.dumps(out))
    pin_note = " (pinned)" if args.pin else ""
    if args.warmup_files:
        pin_note += f" (warm{args.warmup_files})"
    if args.merge_partitions:
        pin_note += f" (mp{args.merge_partitions})"
    for kv in args.conf:
        if kv.startswith("spark.io.compression.codec="):
            pin_note += f" (codec={kv.split('=', 1)[1]})"
    if os.environ.get("SPARK_GRAFT_SEGMENT_CODEC"):
        pin_note += f" (seg={os.environ['SPARK_GRAFT_SEGMENT_CODEC']})"
    # Always tag the effective merge-chunk size: the chunked kernel became the
    # default (BuildConfig.merge_chunk_postings), so an untagged row would be
    # ambiguous between the whole-partition and chunked eras in scaling_summary.
    # The script runs as `python tools/bench_scaling.py`, so the repo root must
    # be added to sys.path before the package import; never let a tagging
    # failure lose the measured row.
    try:
        import sys

        if REPO not in sys.path:
            sys.path.insert(0, REPO)
        from search_engine_spark.index.persist import BuildConfig as _BC

        _chunk = _BC.__dataclass_fields__["merge_chunk_postings"].default_factory()
    except Exception:
        _chunk = os.environ.get("SPARK_GRAFT_MERGE_CHUNK", "unknown")
    pin_note += f" (chunk={_chunk})"
    # Tag the merge strategy (round 4: shuffle-free bucketed merge A/B) —
    # scaling_summary segments on the methodology string, so shuffle rows
    # and bucketed rows must never pool.
    # resolve exactly like BuildConfig does (its default_factory reads the
    # same env var with `or`-normalization, so an empty-string env var and
    # the shipped default both tag correctly)
    try:
        _strat = _BC.__dataclass_fields__["merge_strategy"].default_factory()
    except Exception:
        _strat = os.environ.get("SPARK_GRAFT_MERGE_STRATEGY") or "shuffle"
    if _strat != "shuffle":
        pin_note += f" (merge={_strat})"
    if args.executor_cores:
        ec = args.executor_cores
        lo_lbl = f"{args.low // ec}x{ec}-core executors"
        hi_lbl = f"{args.high // ec}x{ec}-core executors"
    else:
        lo_lbl, hi_lbl = f"local[{args.low}]", f"local[{args.high}]"
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "a") as f:
        f.write(
            f"| {n_files} | {lo_lbl}{pin_note} {lo['files_per_sec']} f/s "
            f"({lo['wall_sec']}s) | {hi_lbl}{pin_note} {hi['files_per_sec']} f/s "
            f"({hi['wall_sec']}s) | {ratio:.2f}x | {eff:.3f} |"
        )
        if stage_eff:
            f.write(
                f" stage-eff seg={stage_eff.get('segments')} "
                f"merge={stage_eff.get('merge')}; tail "
                f"{lo_st.get('tail')}s/{hi_st.get('tail')}s"
            )
        f.write("\n")


if __name__ == "__main__":
    main()
