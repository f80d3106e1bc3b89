#!/usr/bin/env python
"""Round-5 TPU queue, phase 3: the hybrid monotone-gather fix-up A/B,
then the phase-2 steps the relay window cut off.

  1. fixup_base — tuned defaults with MUSCATO_MG_FIXUP=64 (the hybrid
                  now on by default): regression check vs the 2.02M
                  mg_gene measurement (top_k + patch overhead must be
                  noise when no block overflows).
  2. fixup_spos — MUSCATO_MG_SPOS=1 + hybrid: rounds 4-5 measured the
                  spos kernel self-disabling at every window size
                  because a handful of sparse postings blocks beat the
                  131072 cap; the hybrid repairs exactly those blocks.
                  The XLA spos gather this replaces is 0.64s/8M batch.
  3. blk4k      — MUSCATO_MG_BLOCK=4096 (grid-step amortization for the
                  structurally monotone streams; phase-2 cut off here).
  4. blk4k_seg  — + MUSCATO_SEGSCAN=1 (rank stage-3 without scatter).
  5. prefetch2  — 2x4M batches, probe prefetch on vs off, post
                  pack-cache fix.
  6. mesh2      — mesh_sanity with the device-phase split.

Usage: python -u scripts/round5_queue3.py [outdir] (default /tmp/round5_q3)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from round5_queue import BENCH_BIG, grab, grab_metric, run_step  # noqa: E402


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/round5_q3"
    os.makedirs(outdir, exist_ok=True)
    q: dict = {}
    qpath = os.path.join(outdir, "queue.json")

    def save():
        with open(qpath, "w") as f:
            json.dump(q, f, indent=1)

    steps = [
        ("fixup_base", BENCH_BIG, {}),
        ("fixup_spos", BENCH_BIG, {"MUSCATO_MG_SPOS": "1"}),
        ("blk4k", BENCH_BIG, {"MUSCATO_MG_BLOCK": "4096"}),
        ("blk4k_seg", BENCH_BIG,
         {"MUSCATO_MG_BLOCK": "4096", "MUSCATO_SEGSCAN": "1"}),
        ("prefetch2_on", BENCH_BIG + ["--ReadBatch", str(1 << 22)],
         {"MUSCATO_PREFETCH_PROBE": "1"}),
        ("prefetch2_off", BENCH_BIG + ["--ReadBatch", str(1 << 22)],
         {"MUSCATO_PREFETCH_PROBE": "0"}),
    ]
    for name, argv, env in steps:
        rc, log = run_step(name, argv, outdir, env_over=env)
        q[name] = {"exit": rc, "rec": grab_metric(log)}
        save()

    rc, log = run_step(
        "mesh2", ["-m", "muscato_tpu.bench.mesh_sanity"], outdir,
    )
    q["mesh2"] = {"exit": rc, "result": grab(log, "MESH_SANITY ")}
    save()
    print(json.dumps(q, indent=1)[:3000], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
