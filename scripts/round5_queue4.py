#!/usr/bin/env python
"""Round-5 TPU queue, phase 4: verify-body attribution + expand A/B.

  1. micro_verify_1m — the tuned-mode verify attribution microbench
                       (const-read / row-gather-alone / sort+mono-ride)
                       at 1M lanes: names the next structural verify win
                       (the read-row gather is the one stream that stays
                       a plain per-lane XLA gather under dorder).
  2. micro_verify_8m — same at 8M lanes (the real batch's lane count;
                       gather economics change with table-size/lanes).
  3. pexpand_sub     — MUSCATO_PEXPAND_SUB=1 on the big workload: the
                       sub-chunked rank variant of the expand_owners
                       kernel (0.53s/8M batch at default).
  4. pexpand_sub_off — control at the same process count.
  5. engine_check    — the EXTENDED engine-shaped device check (now
                       covers SEGSCAN / PEXPAND_SUB / MG_BLOCK=4096 /
                       full_knobs): tune_finish's hard gate for any
                       round-5 knob defaulting on.

Usage: python -u scripts/round5_queue4.py [outdir] (default /tmp/round5_q4)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from round5_queue import BENCH_BIG, grab, grab_metric, run_step  # noqa: E402


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/round5_q4"
    os.makedirs(outdir, exist_ok=True)
    q: dict = {}
    qpath = os.path.join(outdir, "queue.json")

    def save():
        with open(qpath, "w") as f:
            json.dump(q, f, indent=1)

    for name, arg in (("micro_verify_1m", "1"), ("micro_verify_8m", "8")):
        rc, log = run_step(
            name, ["-m", "muscato_tpu.bench.micro_verify", arg], outdir,
        )
        lines = []
        try:
            with open(log, errors="replace") as f:
                lines = [ln.strip() for ln in f
                         if "ms" in ln or "ns/lane" in ln]
        except OSError:
            pass
        q[name] = {"exit": rc, "lines": lines}
        save()

    steps = [
        # phase-3 measured spos+fixup at 2.34M vs 2.04M base — carry it
        # into every phase-4 A/B so wins compose with the new default.
        ("pexpand_sub", BENCH_BIG,
         {"MUSCATO_PEXPAND_SUB": "1", "MUSCATO_MG_SPOS": "1"}),
        ("pexpand_sub_off", BENCH_BIG,
         {"MUSCATO_PEXPAND_SUB": "0", "MUSCATO_MG_SPOS": "1"}),
        # seg_only was dropped: phase-3's blk4k_seg step never finished
        # ONE batch in 70 min (compile-bound associative scans at 33M
        # lanes through the relay) while the same flags minus SEGSCAN
        # ran in 728s — the SEGSCAN path was deleted with that reason.
    ]
    for name, argv, env in steps:
        rc, log = run_step(name, argv, outdir, env_over=env)
        q[name] = {"exit": rc, "rec": grab_metric(log)}
        save()

    rc, log = run_step(
        "engine_check", ["-m", "muscato_tpu.bench.engine_device_check"],
        outdir,
    )
    q["engine_check"] = {"exit": rc, "results": grab(log, "ENGINE_RESULTS ")}
    save()

    print(json.dumps(q, indent=1)[:3000], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
