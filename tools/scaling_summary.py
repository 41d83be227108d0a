"""Segmented summary of the BENCH_SCALING.md history rows.

The history table is append-only and unfiltered by design (every invocation,
good window or bad); the narrative reports medians/bests over the relevant
SEGMENT of it — same input size, same harness (local[N] vs real multi-JVM
executor cluster), same methodology tags (pinned / warm / codec). Computing
those by hand has already produced one shipped slip, so this script is the
single source for every distribution number quoted in BENCH_SCALING.md,
BASELINE.md, and the memory notes:

    python tools/scaling_summary.py            # all segments
    python tools/scaling_summary.py --json     # machine-readable
    python tools/scaling_summary.py --markdown --min-n 3   # pasteable table

A row is parsed from the markdown line bench_scaling.py / bench_query_scaling.py
append (`| <files> | <lo label> <f/s> (<s>) | <hi label> ... | <x>x | <eff> |`);
prose tables (per-stage, DRAM probe) don't match the pattern and are skipped.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROW = re.compile(
    r"^\| (?P<files>\d+)(?P<query> \(QUERY x\d+\))? \| "
    r"(?P<lo>.+?) \| (?P<hi>.+?) \| (?P<speedup>[\d.]+)x \| "
    r"(?P<eff>[\d.]+) \|(?P<note>.*)$"
)

# the query rows before commit c0348f8 used a query set whose vocabulary
# didn't exist in the corpus (12/20 matched nothing) — annotated as
# superseded in the narrative; excluded from the validated distributions
VACUOUS_QUERY_EFFS = {0.758, 0.733, 0.926, 0.642}


def level_tags(label: str) -> str:
    """Harness + methodology segment key from the level label."""
    m = re.match(r"(?:(\d+)x(\d+)-core executors|local\[(\d+)\])", label)
    if m and m.group(1):
        harness = f"exec-cluster {m.group(2)}-core"
    elif "exec" in label:
        harness = "exec-cluster"
    else:
        harness = "local[N]"
    tags = [harness]
    if "(pinned)" in label:
        tags.append("pinned")
    w = re.search(r"\(warm(\d+)\)", label)
    if w:
        tags.append("warm")
    # untagged rows ran the session default — lz4 before commit cb43bb8
    # made zstd the engine default, zstd after; the label can't tell which.
    # EXCEPT in the chunked-kernel era (chunk= tag present): the chunked
    # kernel postdates the zstd default flip, so an explicit codec=zstd tag
    # and an untagged default row are physically the SAME configuration
    # (the chain-19 note) — pool them under 'default'.
    c = re.search(r"\(codec=(\w+)\)", label)
    codec = c.group(1) if c else "default"
    if codec == "zstd" and "(chunk=" in label:
        codec = "default"
    tags.append(f"shuffle={codec}")
    s = re.search(r"\(seg=(\w+)\)", label)
    if s:
        tags.append(f"seg={s.group(1)}")
    ck = re.search(r"\(chunk=(\d+)\)", label)
    if ck:
        tags.append(f"chunk={ck.group(1)}")
    ms = re.search(r"\(merge=(\w+)\)", label)
    if ms:
        tags.append(f"merge={ms.group(1)}")
    mp = re.search(r"\(mp(\d+)\)", label)
    if mp:
        tags.append(f"mp{mp.group(1)}")
    q = re.search(r"\(serve c=(\d+/\d+)\)", label)
    if q:
        tags.append(f"serve c={q.group(1)}")
    return " ".join(tags)


STAGE_NOTE = re.compile(r"stage-eff seg=(?P<seg>[\d.]+|None) merge=(?P<merge>[\d.]+|None)")


def parse(path: str) -> list[dict]:
    rows = []
    for line in open(path):
        m = ROW.match(line.rstrip())
        if not m:
            continue
        d = m.groupdict()
        sm = STAGE_NOTE.search(d["note"] or "")
        rows.append(
            {
                "files": int(d["files"]),
                "kind": "query" if d["query"] else "build",
                "segment": level_tags(d["lo"].strip()),
                "eff": float(d["eff"]),
                "speedup": float(d["speedup"]),
                "seg_eff": (
                    float(sm["seg"]) if sm and sm["seg"] != "None" else None
                ),
                "merge_eff": (
                    float(sm["merge"]) if sm and sm["merge"] != "None" else None
                ),
            }
        )
    return rows


def summarize(rows: list[dict]) -> list[dict]:
    groups: dict[tuple, list[float]] = {}
    for r in rows:
        if r["kind"] == "query" and r["eff"] in VACUOUS_QUERY_EFFS:
            key = (r["kind"], r["files"], r["segment"] + " [superseded vocab]")
        else:
            key = (r["kind"], r["files"], r["segment"])
        groups.setdefault(key, []).append(r["eff"])
    out = []
    for (kind, files, seg), effs in sorted(groups.items()):
        out.append(
            {
                "kind": kind,
                "files": files,
                "segment": seg,
                "n": len(effs),
                "median": round(statistics.median(effs), 3),
                "best": max(effs),
                "effs": sorted(effs),
            }
        )
    return out


def stage_decomposition(rows: list[dict], files: int) -> dict:
    """Per-stage efficiency decomposition for one input size, pooling every
    chunked-kernel-era build row that carries stage notes (codec is
    scale-neutral per the chain-13 interleaved A/B, so zstd/lz4/default tags
    pool — 'default' IS zstd since commit cb43bb8). Emitted per-row sorted by
    end-to-end efficiency plus stage medians, so the bimodality argument
    (segment stage consistently healthy; merge stage healthy-or-DRAM-degraded)
    is tool-generated rather than hand-assembled."""
    pool = [
        r
        for r in rows
        if r["kind"] == "build"
        and r["files"] == files
        and r["seg_eff"] is not None
        and "chunk=" in r["segment"]
        and "1-core" in r["segment"]
    ]
    pool.sort(key=lambda r: -r["eff"])
    med = lambda k: round(statistics.median(r[k] for r in pool), 3) if pool else None
    return {
        "files": files,
        "n": len(pool),
        "median_eff": med("eff"),
        "median_seg_eff": med("seg_eff"),
        "median_merge_eff": med("merge_eff"),
        "rows": [
            {"eff": r["eff"], "seg_eff": r["seg_eff"], "merge_eff": r["merge_eff"]}
            for r in pool
        ],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument(
        "--stages",
        type=int,
        metavar="FILES",
        help="per-stage efficiency decomposition table for one input size "
        "(chunked-era exec-cluster build rows with stage notes)",
    )
    ap.add_argument(
        "--markdown",
        action="store_true",
        help="emit a markdown table (for the BENCH_SCALING.md summary block)",
    )
    ap.add_argument(
        "--min-n",
        type=int,
        default=1,
        help="markdown mode: only segments with at least this many samples",
    )
    ap.add_argument("--path", default=os.path.join(REPO, "BENCH_SCALING.md"))
    args = ap.parse_args()
    if args.stages:
        d = stage_decomposition(parse(args.path), args.stages)
        if args.json:
            print(json.dumps(d, indent=1))
            return
        print(
            f"| files | n | median end-to-end | median seg-eff | median merge-eff |"
        )
        print("|---|---|---|---|---|")
        print(
            f"| {d['files']} | {d['n']} | {d['median_eff']} "
            f"| {d['median_seg_eff']} | {d['median_merge_eff']} |"
        )
        print()
        print("| end-to-end eff | segment-stage eff | merge-stage eff |")
        print("|---|---|---|")
        for r in d["rows"]:
            print(f"| {r['eff']:.3f} | {r['seg_eff']:.3f} | {r['merge_eff']:.3f} |")
        return
    summary = summarize(parse(args.path))
    if args.json:
        print(json.dumps(summary, indent=1))
        return
    if args.markdown:
        print("| kind | files | segment | n | median | best | samples |")
        print("|---|---|---|---|---|---|---|")
        for g in summary:
            if g["n"] < args.min_n or "superseded" in g["segment"]:
                continue
            effs = ", ".join(f"{e:g}" for e in g["effs"])
            print(
                f"| {g['kind']} | {g['files']} | {g['segment']} | {g['n']} "
                f"| {g['median']:.3f} | {g['best']:.3f} | {effs} |"
            )
        return
    for g in summary:
        print(
            f"{g['kind']:5s} {g['files']:>8d}  {g['segment']:<55s} "
            f"n={g['n']:<3d} median={g['median']:.3f} best={g['best']:.3f}"
        )
        print(f"{'':22s}{g['effs']}")


if __name__ == "__main__":
    main()
