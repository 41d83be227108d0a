#!/usr/bin/env python
"""Per-stage forensics from a Spark event log (pure python, no Spark).

Used to decompose scaling-efficiency gaps: for every stage it reports the
stage wall, the sum/max of task durations, executor run/CPU/GC time, shuffle
fetch-wait and remote/local bytes, and the achieved task concurrency
(sum task duration / stage wall). Run a build with

    --conf spark.eventLog.enabled=true --conf spark.eventLog.dir=/tmp/evlog

then:  python tools/evlog_report.py /tmp/evlog            # newest app
       python tools/evlog_report.py /tmp/evlog/local-123  # specific app

With --warmup-split, stages are listed in submission order so the untimed
warmup build's stages (same names, earlier timestamps) are visually separate
from the timed build's.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict


def newest_app(path: str) -> str:
    if os.path.isfile(path):
        return path
    # Rolling event-log v2 directories hold events_N_<app>[.codec] plus an
    # empty appstatus marker; prefer the events file.
    names = [f for f in os.listdir(path) if not f.startswith(".")]
    events = [f for f in names if f.startswith("events_")]
    if events:
        return os.path.join(path, max(events, key=lambda f: os.path.getmtime(os.path.join(path, f))))
    cands = [
        os.path.join(path, f)
        for f in names
        if not f.endswith(".inprogress.crc")
    ]
    if not cands:
        sys.exit(f"no event logs under {path}")
    newest = max(cands, key=os.path.getmtime)
    return newest_app(newest) if os.path.isdir(newest) else newest


def open_log(path: str):
    """Open a (possibly zstd-compressed) event log as a text line iterator."""
    if path.endswith((".zstd", ".zst")):
        import io
        import subprocess

        zstd = subprocess.run(
            ["zstd", "-dc", path], capture_output=True, check=True
        )
        return io.StringIO(zstd.stdout.decode())
    return open(path)


def load(path: str):
    stages: dict[int, dict] = {}
    tasks = defaultdict(list)
    execs: dict[str, dict] = {}
    with open_log(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind in ("SparkListenerStageSubmitted", "SparkListenerStageCompleted"):
                si = ev["Stage Info"]
                st = stages.setdefault(si["Stage ID"], {})
                st["name"] = si.get("Stage Name", "?")
                st["n_tasks"] = si.get("Number of Tasks")
                if si.get("Submission Time"):
                    st["submit"] = si["Submission Time"]
                if si.get("Completion Time"):
                    st["complete"] = si["Completion Time"]
            elif kind == "SparkListenerTaskEnd":
                ti = ev.get("Task Info") or {}
                tm = ev.get("Task Metrics") or {}
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                im = tm.get("Input Metrics") or {}
                tasks[ev["Stage ID"]].append(
                    {
                        "dur": ti.get("Finish Time", 0) - ti.get("Launch Time", 0),
                        "exec": ti.get("Executor ID", "?"),
                        "run": tm.get("Executor Run Time", 0),
                        "cpu_ms": (tm.get("Executor CPU Time", 0) or 0) / 1e6,
                        "deser": tm.get("Executor Deserialize Time", 0),
                        "gc": tm.get("JVM GC Time", 0),
                        "result_ser": tm.get("Result Serialization Time", 0),
                        "fetch_wait": sr.get("Fetch Wait Time", 0),
                        "remote_b": sr.get("Remote Bytes Read", 0),
                        "local_b": sr.get("Local Bytes Read", 0),
                        "sw_b": sw.get("Shuffle Bytes Written", 0),
                        "sw_ms": (sw.get("Shuffle Write Time", 0) or 0) / 1e6,
                        "in_b": im.get("Bytes Read", 0),
                    }
                )
            elif kind == "SparkListenerExecutorAdded":
                execs[ev["Executor ID"]] = ev.get("Executor Info", {})
    return stages, tasks, execs


def mb(b: float) -> str:
    return f"{b / 1e6:.0f}MB"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log", help="event log file or directory (newest app wins)")
    ap.add_argument("--min-wall", type=float, default=0.5,
                    help="hide stages shorter than this many seconds")
    args = ap.parse_args()

    path = newest_app(args.log)
    stages, tasks, execs = load(path)
    print(f"# {path}  ({len(execs) or 1} executors)")
    hdr = (
        "stage  wall_s  ntask  conc  sum_dur  max_dur  cpu_s  gc_s  deser_s "
        " fetchw_s  remote   local    shufw   input  name"
    )
    print(hdr)
    for sid in sorted(stages, key=lambda s: stages[s].get("submit", 0)):
        st = stages[sid]
        ts = tasks.get(sid, [])
        if "submit" not in st or "complete" not in st:
            continue
        wall = (st["complete"] - st["submit"]) / 1e3
        if wall < args.min_wall:
            continue
        sum_dur = sum(t["dur"] for t in ts) / 1e3
        max_dur = max((t["dur"] for t in ts), default=0) / 1e3
        conc = sum_dur / wall if wall else 0.0
        cpu = sum(t["cpu_ms"] for t in ts) / 1e3
        gc = sum(t["gc"] for t in ts) / 1e3
        deser = sum(t["deser"] for t in ts) / 1e3
        fw = sum(t["fetch_wait"] for t in ts) / 1e3
        rb = sum(t["remote_b"] for t in ts)
        lb = sum(t["local_b"] for t in ts)
        swb = sum(t["sw_b"] for t in ts)
        ib = sum(t["in_b"] for t in ts)
        name = st["name"].split("\n")[0][:60]
        print(
            f"{sid:>5}  {wall:6.1f}  {len(ts):5d}  {conc:4.1f}  {sum_dur:7.1f}"
            f"  {max_dur:7.1f}  {cpu:5.0f}  {gc:4.1f}  {deser:7.1f}  {fw:8.1f}"
            f"  {mb(rb):>7} {mb(lb):>7} {mb(swb):>7} {mb(ib):>7}  {name}"
        )
    # per-executor busy time over the whole app (all stages)
    busy = defaultdict(float)
    for ts in tasks.values():
        for t in ts:
            busy[t["exec"]] += t["dur"] / 1e3
    if len(busy) > 1:
        print("executor busy seconds:",
              {k: round(v, 1) for k, v in sorted(busy.items())})


if __name__ == "__main__":
    main()
