#!/usr/bin/env python
"""Round-5 phase-2 TPU queue: A/B the new perf stack, then re-check mesh.

  1. mg_gene      — monotone gene lookup in the verify loop (now default;
                    the round-5 profile attributed ~0.9s of the 1.5s
                    verify chunk loop to the lookup's element gathers).
  2. mg_gene_off  — control at MUSCATO_MG_GENE=0 (same process count).
  3. blk4k        — + MUSCATO_MG_BLOCK=4096 (grid-step amortization for
                    the structurally monotone streams).
  4. blk4k_seg    — + MUSCATO_SEGSCAN=1 (rank stage-3 without scatter).
  5. prefetch2    — 2x4M batches, probe prefetch on vs off, now that the
                    whole-collection pack cache removed the 5-10s of
                    in-loop host packing that drowned the first A/B.
  6. mesh2        — mesh_sanity with the device-phase split + explicit
                    dp-sharded placement.

Usage: python -u scripts/round5_queue2.py [outdir] (default /tmp/round5_q2)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from round5_queue import BENCH_BIG, grab, grab_metric, run_step  # noqa: E402


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/round5_q2"
    os.makedirs(outdir, exist_ok=True)
    q: dict = {}
    qpath = os.path.join(outdir, "queue.json")

    def save():
        with open(qpath, "w") as f:
            json.dump(q, f, indent=1)

    steps = [
        ("mg_gene", BENCH_BIG, {}),
        ("mg_gene_off", BENCH_BIG, {"MUSCATO_MG_GENE": "0"}),
        ("blk4k", BENCH_BIG, {"MUSCATO_MG_BLOCK": "4096"}),
        ("blk4k_seg", BENCH_BIG,
         {"MUSCATO_MG_BLOCK": "4096", "MUSCATO_SEGSCAN": "1"}),
        ("prefetch2_on", BENCH_BIG + ["--ReadBatch", str(1 << 22)],
         {"MUSCATO_PREFETCH_PROBE": "1", "MUSCATO_MG_BLOCK": "4096"}),
        ("prefetch2_off", BENCH_BIG + ["--ReadBatch", str(1 << 22)],
         {"MUSCATO_PREFETCH_PROBE": "0", "MUSCATO_MG_BLOCK": "4096"}),
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
