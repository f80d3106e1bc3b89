#!/usr/bin/env python
"""Run individual autotune ladder steps and fold them into an existing
outdir/ladder.json (manual continuation of scripts/autotune_r3.py).

Why this exists: every MUSCATO_MGATHER=1 step on the realistic workload
burns ~10-30 min of relay compiles regrowing the postings window before
self-disabling that stream (the runs exceed the largest device-proven
window).  Re-running those steps with MUSCATO_MG_SPOS=0 measures the
same converged configuration without the churn — the compile cache is
unavailable on this host (relay deadlock), so churn is pure loss.

Usage: python -u scripts/run_ladder_steps.py <outdir> <step[,step...]> [env=val ...]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from autotune_r3 import BENCH_ARGS, LADDER, parse_bench, run_step  # noqa: E402


def main() -> int:
    outdir = sys.argv[1]
    names = sys.argv[2].split(",")
    extra = dict(kv.split("=", 1) for kv in sys.argv[3:])
    lpath = os.path.join(outdir, "ladder.json")
    with open(lpath) as f:
        ladder = json.load(f)
    table = dict(LADDER)
    for name in names:
        env_over = dict(table[name], **extra)
        rc, log = run_step(name, ["bench.py", *BENCH_ARGS], env_over, outdir)
        ladder[name] = parse_bench(log)
        with open(lpath, "w") as f:
            json.dump(ladder, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
