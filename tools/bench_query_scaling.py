#!/usr/bin/env python
"""Query-side scaling evidence (north_rule, VERDICT r02 item 8): the same
headline retrieval query set answered against the same PackedIndex at two
parallelism levels — pinned local[N] vs local[4N] as the sandbox stand-in
for N- vs 4N-executor clusters.

The index is built ONCE (untimed, full host parallelism); each level then
opens it read-only in a fresh pinned subprocess and runs the query set
``--passes`` times via jobs/run_queries.py — pass 1 absorbs JVM JIT/codegen
warmup, best pass wins (the same steady-state methodology as
bench_scaling.py --warmup-files). Efficiency = (qps@4N / qps@N) / 4.

    python tools/bench_query_scaling.py --files 100000 --low 1 --high 4 --pin

Appends a ``query`` metric row to BENCH_SCALING.md (same table, labeled
"queries" instead of "f/s") and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Representative mix over the deterministic synthetic corpus
# (search_engine_spark/corpus.py vocabulary): flat BM25 BOW over mid-df
# identifiers, a heavy stopword-grade keyword pair (salted terms), a rare-term
# query, planted-phrase positional operators, and weighted combines.
QUERY_SET = [
    # corpus VOCAB is {stem}_{action} compound identifiers (corpus.py:_STEMS
    # x _ACTIONS, zipf-ranked in that order) plus planted phrases, rare df=1
    # terms, and language keywords (most of which the code tokenizer drops
    # as stopwords). An earlier revision of this set queried bare stems
    # ("parse token index") that do not exist as tokens — 12 of its 20
    # queries matched nothing, so its rows measured mostly the planning
    # floor; rows from that set are annotated in BENCH_SCALING.md.
    ("1", "parse_init token_peek index_build"),       # heavy+mid zipf ranks
    ("2", "merge_drain shard_pack codec_encode"),
    ("3", "parse_next parse_prev parse_push"),        # hottest stem, rank 2-4
    ("4", "rare_alpha rare_beta"),                    # df=1 planted
    ("5", "#NEAR/2(open file)"),                      # planted phrase prefix
    ("6", "#WINDOW/8(lock free queue)"),
    ("7", "#SYN(query_init score_init rank_init)"),
    ("8", "#SUM(posting_pack block_align varint_encode)"),
    ("9", "#SUM(ring buffer slot)"),                  # planted phrase BOW
    ("10", "scan_seek filter_bind join_take batch_load"),
    ("11", "hash_probe salt_mark split_grow"),
    ("12", "doc_emit field_fill stat_probe"),
    ("13", "parse_init merge_init"),                  # two heavy heads
    ("14", "func package struct"),                    # non-stopword keywords
    ("15", "#NEAR/3(ring buffer)"),
    ("16", "#WINDOW/4(open file handle)"),
    ("17", "#SYN(delta_decode varint_decode)"),
    ("18", "score_get rank_find query_load parse_take"),
    ("19", "spark_run table_tick plan_step"),
    ("20", "rare_gamma index_align merge_swap"),
]


def build_index(files: int, out_dir: str, cores: int) -> None:
    if os.path.exists(os.path.join(out_dir, "manifest.json")):
        return  # reuse — the build job validates fingerprint+config on open
    cmd = [
        sys.executable, os.path.join(REPO, "jobs", "build_index.py"),
        "--synthetic", str(files), "--out", out_dir, "--cores", str(cores),
    ]
    _run_checked(cmd)


def _run_checked(cmd: list[str]) -> subprocess.CompletedProcess:
    """subprocess.run(check=True) that surfaces the child's stderr tail on
    failure — a bare CalledProcessError from a captured child is
    undiagnosable in a nohup chain log (chain-17 lost a query sample to
    exactly that)."""
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        tail = "\n".join(res.stderr.splitlines()[-30:])
        print(f"FAILED ({res.returncode}): {' '.join(cmd)}\n--- stderr tail ---\n{tail}",
              file=sys.stderr)
        raise subprocess.CalledProcessError(res.returncode, cmd,
                                            res.stdout, res.stderr)
    return res


def run_level(cores: int, index_dir: str, qfile: str, passes: int,
              pin: bool, model: str, concurrency: int = 1) -> dict:
    cmd = [
        sys.executable, os.path.join(REPO, "jobs", "run_queries.py"),
        "--index", index_dir, "--queries", qfile,
        "--out", f"/tmp/qscale_run_{cores}.trec",
        "--cores", str(cores), "--passes", str(passes), "--model", model,
        "--concurrency", str(concurrency),
    ]
    if pin:
        cmd = ["taskset", "-c", f"0-{cores - 1}" if cores > 1 else "0"] + cmd
    res = _run_checked(cmd)
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=100000)
    ap.add_argument("--low", type=int, default=1)
    ap.add_argument("--high", type=int, default=4)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=1,
                    help="interleaved level repeats; best qps per level wins")
    ap.add_argument("--pin", action="store_true")
    ap.add_argument("--model", default="BM25")
    ap.add_argument("--workdir", default="/tmp/bench_qscaling")
    ap.add_argument("--serve", action="store_true",
                    help="serving-throughput mode: each level answers "
                         "min(cores, n_queries) queries CONCURRENTLY "
                         "(thread-pool submission), so one query's serial "
                         "driver planning overlaps another's executor work "
                         "— the workload shape of a real search cluster. "
                         "Without it, queries run one-at-a-time and the "
                         "per-query driver floor (Amdahl) caps efficiency.")
    ap.add_argument("--queue-depth", type=int, default=1,
                    help="serve-mode in-flight queries per core (both levels "
                         "use the same per-core depth, so the N-vs-4N "
                         "comparison stays resource-proportional). Depth >1 "
                         "keeps executor threads fed while other queries' "
                         "GIL-bound driver planning runs — the standing "
                         "request queue every real search cluster has.")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    index_dir = os.path.join(args.workdir, f"idx_{args.files}")
    build_index(args.files, index_dir, cores=os.cpu_count() or 8)

    qfile = os.path.join(args.workdir, "queries.txt")
    with open(qfile, "w") as f:
        f.write("\n".join(f"{qid}:{q}" for qid, q in QUERY_SET) + "\n")

    n_q = len(QUERY_SET)
    conc_lo = min(args.low * args.queue_depth, n_q) if args.serve else 1
    conc_hi = min(args.high * args.queue_depth, n_q) if args.serve else 1
    runs: dict[str, list[dict]] = {"lo": [], "hi": []}
    for _ in range(args.repeats):
        runs["lo"].append(
            run_level(args.low, index_dir, qfile, args.passes, args.pin,
                      args.model, conc_lo)
        )
        runs["hi"].append(
            run_level(args.high, index_dir, qfile, args.passes, args.pin,
                      args.model, conc_hi)
        )
    lo = max(runs["lo"], key=lambda r: r["queries_per_sec"])
    hi = max(runs["hi"], key=lambda r: r["queries_per_sec"])

    ratio = hi["queries_per_sec"] / lo["queries_per_sec"]
    eff = ratio / (args.high / args.low)

    # rank identity across parallelism levels (north_rule: same top-k docids
    # and scores regardless of cluster size)
    with open(f"/tmp/qscale_run_{args.low}.trec") as f_lo, \
         open(f"/tmp/qscale_run_{args.high}.trec") as f_hi:
        lo_txt, hi_txt = f_lo.read(), f_hi.read()
    rank_identical = lo_txt == hi_txt
    # vacuousness guard: a query that matches nothing emits one TREC dummy
    # row, and two levels of nothing are trivially "identical" — count the
    # no-match queries so an empty-result run can't pass as evidence
    dummy_queries = sum(
        1 for line in lo_txt.splitlines() if line.split(" ")[2] == "dummy"
    )
    if dummy_queries > len(QUERY_SET) // 4:
        print(
            f"WARNING: {dummy_queries}/{len(QUERY_SET)} queries matched "
            "nothing — row is vacuous, check QUERY_SET vs corpus vocabulary",
            file=sys.stderr,
        )
    out = {
        "metric": "query_scaling",
        "files": args.files,
        "n_queries": len(QUERY_SET),
        "passes": args.passes,
        "pinned": args.pin,
        "serve_concurrency": [conc_lo, conc_hi],
        "low_cores": args.low,
        "high_cores": args.high,
        "low_qps": lo["queries_per_sec"],
        "high_qps": hi["queries_per_sec"],
        "low_best_pass_sec": lo["best_pass_sec"],
        "high_best_pass_sec": hi["best_pass_sec"],
        "low_pass_secs": lo["pass_secs"],
        "high_pass_secs": hi["pass_secs"],
        "speedup": round(ratio, 3),
        "scaling_efficiency": round(eff, 3),
        "rank_identical_across_levels": rank_identical,
        "no_match_queries": dummy_queries,
    }
    print(json.dumps(out))
    pin_note = " (pinned)" if args.pin else ""
    if args.serve:
        pin_note += f" (serve c={conc_lo}/{conc_hi})"
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "a") as f:
        f.write(
            f"| {args.files} (QUERY x{len(QUERY_SET)}) | local[{args.low}]{pin_note} "
            f"{lo['queries_per_sec']} q/s ({lo['best_pass_sec']}s) | "
            f"local[{args.high}]{pin_note} {hi['queries_per_sec']} q/s "
            f"({hi['best_pass_sec']}s) | {ratio:.2f}x | {eff:.3f} |"
            f" rank-identical={rank_identical};"
            f" no-match {dummy_queries}/{len(QUERY_SET)}\n"
        )


if __name__ == "__main__":
    main()
