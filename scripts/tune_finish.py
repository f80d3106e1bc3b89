#!/usr/bin/env python
"""Write muscato_tpu/TUNED.json from a (possibly partial) autotune ladder.

scripts/autotune_r3.py only writes TUNED.json after its full ladder loop
completes; on a host whose TPU relay has bounded uptime the sweep may be
cut short with several steps banked in <outdir>/ladder.json.  This tool
applies the same winner-selection rule to whatever steps finished, so a
partial sweep still lands measured defaults.

Usage: python scripts/tune_finish.py [outdir] (default /tmp/autotune_r3)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from autotune_r3 import FLAG_NAMES, LADDER, chip_value  # noqa: E402


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/autotune_r3"
    with open(os.path.join(outdir, "ladder.json")) as f:
        ladder = json.load(f)
    steps = [(n, cfg) for n, cfg in LADDER if n in ladder]
    scored = {n: chip_value(ladder.get(n)) for n, _ in steps}
    ok = {n: v for n, v in scored.items() if v}
    if not ok:
        print("no step produced a chip number; nothing to write")
        return 1
    winner = max(ok, key=lambda n: ok[n])
    env_over = dict(LADDER)[winner]
    rec = ladder[winner]
    flags = {k: int(env_over.get(k, "0")) for k in FLAG_NAMES}
    # HARD GATE (round-4 VERDICT weak #6): a flag may only default ON if
    # the engine-shaped device check passed for it in this sweep.  A
    # ladder banked without an engine_check record (or with a flag the
    # check never reached) writes that flag OFF — an A/B win on one
    # workload shape is not proof the kernel is correct on engine-shaped
    # inputs (dead tails, skewed runs).
    eng = ladder.get("engine_check") or {}
    dropped = [k for k, v in flags.items() if v and not eng.get(k)]
    for k in dropped:
        flags[k] = 0
    if dropped:
        print(f"engine-check gate: dropped {dropped} (not proven "
              f"engine-shaped on device this sweep)")
    tuned = {
        "flags": flags,
        "provenance": {
            "winner": winner,
            "reads_per_sec_chip": ok[winner],
            "ladder": scored,
            "engine_check": eng,
            "engine_check_dropped": dropped,
            "device_kind": rec.get("device_kind")
            or (rec.get("detail") or {}).get("device_kind"),
            "pallas_compile_ok": ladder.get("pallas_compile_ok"),
            "partial_sweep": True,
            "date": time.strftime("%Y-%m-%d"),
            "tool": "scripts/tune_finish.py",
        },
    }
    tpath = os.environ.get(
        "AUTOTUNE_TUNED_PATH", os.path.join(REPO, "muscato_tpu", "TUNED.json")
    )
    with open(tpath, "w") as f:
        json.dump(tuned, f, indent=1)
        f.write("\n")
    print(f"winner={winner} {ok[winner]:.0f} reads/s "
          f"({len(ok)}/{len(LADDER)} steps) -> {tpath}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
