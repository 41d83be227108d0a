#!/usr/bin/env python
"""Probe-gated 1M scaling campaign (VERDICT r04 item 2).

Grows the gated 1M sample pool under the SHIPPED DEFAULT configuration:
before each sample, the DRAM probe (tools/membw_probe.py methodology) must
read >= --gate GB/s/proc at 4-way — the strict gate under which chain-22's
healthy windows posted 0.810/0.855 — else the launch is skipped and retried
after --cooldown. A post-run probe is recorded too, so mid-run DRAM drift
(probe healthy at launch, collapse minutes later — the documented
bimodality, BENCH_SCALING.md) is attributable per sample.

Each accepted sample runs the canonical 1M harness:

    tools/bench_scaling.py --files 1000000 --low 1 --high 4 \
        --executor-cores 1 --pin --warmup-files 5000 --repeats 1

which appends its row to BENCH_SCALING.md (tagged (merge=bucketed) via
BuildConfig's default). The campaign interleaves gate-probe annotations
into BENCH_SCALING.md so the pool's provenance is on the page.

    python tools/scaling_campaign.py --samples 5 [--gate 15.5]
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from membw_probe import measure  # noqa: E402

PAGE = os.path.join(REPO, "BENCH_SCALING.md")
ROW_RE = re.compile(r"^\| (\d+) \| .* \| [\d.]+x \| ([\d.]+) \|")


def note(line: str) -> None:
    with open(PAGE, "a") as f:
        f.write(line.rstrip() + "\n")
    print(line, flush=True)


def last_eff() -> float | None:
    with open(PAGE) as f:
        for line in reversed(f.readlines()):
            m = ROW_RE.match(line)
            if m:
                return float(m.group(2))
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=5,
                    help="gated samples to collect")
    ap.add_argument("--gate", type=float, default=15.5,
                    help="min GB/s/proc at 4-way to launch")
    ap.add_argument("--files", type=int, default=1_000_000)
    ap.add_argument("--workdir", default="/tmp/bsc_b1m")
    ap.add_argument("--cooldown", type=int, default=90,
                    help="seconds between probe attempts on a gate miss")
    ap.add_argument("--max-attempts", type=int, default=60)
    ap.add_argument("--stop-file", default="/tmp/scaling_campaign.stop",
                    help="touch this file to end the campaign cleanly")
    args = ap.parse_args()

    effs: list[float] = []
    for attempt in range(1, args.max_attempts + 1):
        if len(effs) >= args.samples:
            break
        if os.path.exists(args.stop_file):
            note(f"> campaign: stop file {args.stop_file} present — ending")
            break
        bw = measure(4) / 4.0
        if bw < args.gate:
            print(
                f"[{attempt}] gate MISS {bw:.2f} < {args.gate} GB/s/proc — "
                f"cooldown {args.cooldown}s", flush=True,
            )
            time.sleep(args.cooldown)
            continue
        note(
            f"> gate probe {bw:.2f} GB/s/proc at 4-way (>= {args.gate}) — "
            f"sample {len(effs) + 1}/{args.samples} launched (shipped default)"
        )
        t0 = time.time()
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "tools", "bench_scaling.py"),
             "--files", str(args.files), "--low", "1", "--high", "4",
             "--executor-cores", "1", "--pin",
             "--warmup-files", "5000", "--repeats", "1",
             "--workdir", args.workdir],
            cwd=REPO,
        )
        bw2 = measure(4) / 4.0
        if rc != 0:
            note(f"> sample FAILED rc={rc} (post-probe {bw2:.2f} GB/s/proc)")
            continue
        eff = last_eff()
        effs.append(eff if eff is not None else float("nan"))
        note(
            f"> post-run probe {bw2:.2f} GB/s/proc "
            f"({'held' if bw2 >= args.gate else 'DRIFTED'}); "
            f"eff {eff}; wall {time.time() - t0:.0f}s"
        )
    effs_s = sorted(e for e in effs if e == e)
    med = effs_s[len(effs_s) // 2] if effs_s else None
    note(
        f"> campaign done: n={len(effs_s)} gated samples {effs_s} "
        f"median {med}"
    )


if __name__ == "__main__":
    main()
