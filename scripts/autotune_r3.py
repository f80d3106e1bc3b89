#!/usr/bin/env python
"""Unattended TPU kernel autotune (round 3).

Runs the engine-flag A/B ladder on the big workload IN PRIORITY ORDER
(the relay to this host's TPU has unpredictable uptime windows — the
most decision-relevant numbers must land first), then writes the winning
flag combination to muscato_tpu/TUNED.json.  From then on the tuned
flags are the engine defaults (ops/fused.py reads TUNED.json; env vars
still override), so the driver's plain `python bench.py` and every
production run get the measured-best configuration.

Usage:  python scripts/autotune_r3.py [outdir]        (default /tmp/autotune_r3)

Every step is its own subprocess with a hard timeout, so a relay hang or
device OOM cannot take down the sweep; a failed step is recorded as null
and the ladder continues.  Artifacts:
  outdir/<step>.log      full stdout/stderr per step
  outdir/ladder.json     step -> parsed bench JSON (or null)
  outdir/ladder.md       markdown A/B table for BENCHMARKS.md
  muscato_tpu/TUNED.json the winner (only written if a step succeeded)
  outdir/final.json      confirmation run with tuned defaults
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEP_TIMEOUT = int(os.environ.get("AUTOTUNE_STEP_TIMEOUT", "5400"))
FLAG_NAMES = ("MUSCATO_MGATHER", "MUSCATO_PJOIN", "MUSCATO_DORDER",
              "MUSCATO_PEXPAND")
# Dry-run knobs (tests/test_autotune.py drives the whole script on CPU):
BENCH_ARGS = os.environ.get(
    "AUTOTUNE_BENCH_ARGS", "--Workload big --Repeats 2 --NoProbe"
).split()
ACCEPT_CPU = os.environ.get("AUTOTUNE_ACCEPT_CPU") == "1"
LADDER_SUBSET = [
    s for s in os.environ.get("AUTOTUNE_LADDER", "").split(",") if s
]
SKIP_PALLAS = os.environ.get("AUTOTUNE_SKIP_PALLAS") == "1"

# Priority order: projected winner first, then the baseline it must beat,
# then single-flag attributions, then the remaining pair.
def _cfg(mg=0, pj=0, do=0, px=0):
    return dict(
        MUSCATO_MGATHER=str(mg), MUSCATO_PJOIN=str(pj),
        MUSCATO_DORDER=str(do),
        MUSCATO_PEXPAND=str(px),
    )


LADDER = [
    # MUSCATO_VTAIL steps were removed with the kernel (round-4 device
    # ladder: the compaction kernel lost every site, 643k vs 1,677k
    # reads/s — see BENCHMARKS.md).
    ("full", _cfg(1, 1, 1, 1)),
    ("xla", _cfg()),
    ("px", _cfg(px=1)),
    ("mg_do", _cfg(1, 0, 1)),
    ("mg", _cfg(mg=1)),
    ("pj", _cfg(pj=1)),
    ("do", _cfg(do=1)),
    ("mg_pj", _cfg(1, 1)),
    # Round-4 combos around the first measured winner (px +15%):
    ("px_do", _cfg(do=1, px=1)),
    ("pj_px", _cfg(pj=1, px=1)),
    ("mg_px", _cfg(mg=1, px=1)),
    # dorder makes the verify's target stream monotone — the rows
    # monotone-gather kernel is built for exactly that stream.
    ("mg_px_do", _cfg(mg=1, do=1, px=1)),
]


def run_step(name, argv, env_over, outdir, timeout=STEP_TIMEOUT):
    log = os.path.join(outdir, f"{name}.log")
    env = dict(os.environ, PYTHONUNBUFFERED="1", **env_over)
    t0 = time.time()
    print(f"=== {name}: {' '.join(argv)} {env_over}", flush=True)
    try:
        with open(log, "wb") as f:
            r = subprocess.run(
                [sys.executable, "-u", *argv],
                cwd=REPO, env=env, stdout=f, stderr=subprocess.STDOUT,
                timeout=timeout,
            )
        rc = r.returncode
    except subprocess.TimeoutExpired:
        rc = -9
    print(f"    exit={rc} ({time.time() - t0:.0f}s)", flush=True)
    return rc, log


def parse_bench(log):
    """Last {"metric": ...} JSON line in the step log, or None."""
    try:
        with open(log, errors="replace") as f:
            lines = [ln for ln in f if ln.startswith('{"metric"')]
        return json.loads(lines[-1]) if lines else None
    except Exception:
        return None


def chip_value(rec):
    if not rec:
        return None
    if rec.get("metric") == "reads_per_sec_chip" and not rec.get("skipped"):
        return rec.get("value")
    if ACCEPT_CPU and rec.get("metric") == "reads_per_sec_cpu_fallback":
        return rec.get("value")
    return None


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/autotune_r3"
    os.makedirs(outdir, exist_ok=True)
    ladder: dict = {}
    lpath = os.path.join(outdir, "ladder.json")

    def save():
        with open(lpath, "w") as f:
            json.dump(ladder, f, indent=1)

    # 0. First TPU minute: compile + oracle-check every Pallas kernel on
    #    the device, so a Mosaic rejection is diagnosed before any bench
    #    (round-2 VERDICT weak #5).  Per-kernel verdicts restrict only the
    #    flags whose kernels failed.
    kernel_flags = {
        "monotone_gather": "MUSCATO_MGATHER",
        "monotone_gather_rows": "MUSCATO_MGATHER",
        "sorted_join": "MUSCATO_PJOIN",
        "expand_owners": "MUSCATO_PEXPAND",
    }
    if SKIP_PALLAS:
        pallas_ok, bad_flags = True, set()
    else:
        rc, log = run_step(
            "pallas_compile", ["-m", "muscato_tpu.bench.pallas_device_check"],
            {}, outdir, timeout=3600,
        )
        pallas_ok = rc == 0
        results = {}
        try:
            with open(log, errors="replace") as f:
                for ln in f:
                    if ln.startswith("PALLAS_RESULTS "):
                        results = json.loads(ln.split(" ", 1)[1])
        except Exception:
            pass
        if not pallas_ok and not results:
            # The check crashed before reporting: distrust every kernel.
            results = {k: False for k in kernel_flags}
        bad_flags = {
            kernel_flags[k] for k, ok in results.items()
            if not ok and k in kernel_flags
        }
    ladder["pallas_compile_ok"] = pallas_ok
    ladder["pallas_bad_flags"] = sorted(bad_flags)
    save()

    # 0b. Engine-shaped device validation (round-4 VERDICT item 5): the
    #     full engine per flag vs the XLA path on a realistic workload —
    #     every kernel sees exactly the probe/expand distributions (dead
    #     tails, skewed runs) that synthetic checks miss.  A failing
    #     flag's ladder steps are skipped like a Mosaic failure.
    if not SKIP_PALLAS:
        rc, log = run_step(
            "engine_check", ["-m", "muscato_tpu.bench.engine_device_check"],
            {}, outdir, timeout=3600,
        )
        eng = {}
        try:
            with open(log, errors="replace") as f:
                for ln in f:
                    if ln.startswith("ENGINE_RESULTS "):
                        eng = json.loads(ln.split(" ", 1)[1])
        except Exception:
            pass
        if rc != 0 and not eng:
            eng = {k: False for k in FLAG_NAMES}
        bad_flags |= {k for k, ok in eng.items() if not ok and k in FLAG_NAMES}
        ladder["engine_check"] = eng
        ladder["pallas_bad_flags"] = sorted(bad_flags)
        save()
    steps = [
        s for s in LADDER
        if not any(s[1].get(f) == "1" for f in bad_flags)
    ]
    if LADDER_SUBSET:
        steps = [s for s in steps if s[0] in LADDER_SUBSET]
    if bad_flags:
        print(f"!!! Pallas kernels failed for {sorted(bad_flags)} — "
              f"ladder reduced to {[n for n, _ in steps]}", flush=True)

    # 1. The A/B ladder, most decision-relevant first.
    for name, env_over in steps:
        rc, log = run_step(name, ["bench.py", *BENCH_ARGS], env_over, outdir)
        ladder[name] = parse_bench(log)
        save()

    scored = {n: chip_value(ladder.get(n)) for n, _ in steps}
    ok = {n: v for n, v in scored.items() if v}
    with open(os.path.join(outdir, "ladder.md"), "w") as f:
        f.write("| config | reads/s/chip | device match s |\n|---|---|---|\n")
        for n, _ in steps:
            rec = ladder.get(n) or {}
            d = (rec.get("detail") or {}).get("big", {})
            f.write(f"| {n} | {scored.get(n) or 'FAILED'} "
                    f"| {d.get('match_device_s', '-')} |\n")
    if not ok:
        print("No step produced a chip number — TUNED.json not written",
              flush=True)
        return 1

    winner = max(ok, key=lambda n: ok[n])
    env_over = dict(LADDER)[winner]
    flags = {k: int(env_over.get(k, "0")) for k in FLAG_NAMES}
    rec = ladder[winner]
    tuned = {
        "flags": flags,
        "provenance": {
            "winner": winner,
            "reads_per_sec_chip": ok[winner],
            "ladder": scored,
            "device_kind": (rec.get("detail") or {}).get("device_kind"),
            "pallas_compile_ok": pallas_ok,
            "date": time.strftime("%Y-%m-%d"),
            "tool": "scripts/autotune_r3.py",
        },
    }
    tpath = os.environ.get(
        "AUTOTUNE_TUNED_PATH", os.path.join(REPO, "muscato_tpu", "TUNED.json")
    )
    with open(tpath, "w") as f:
        json.dump(tuned, f, indent=1)
        f.write("\n")
    print(f"winner={winner} {ok[winner]:.0f} reads/s -> {tpath}", flush=True)

    # 2. Confirmation with tuned defaults (what the driver will run),
    #    plus the 8M single-batch scaling point.
    env_tuned = {"MUSCATO_TUNED": tpath}
    if ACCEPT_CPU:
        final_args, m8_args = BENCH_ARGS, None  # dry-run: keep it small
    else:
        final_args = ["--Workload", "both", "--Repeats", "3", "--NoProbe"]
        m8_args = ["--Workload", "big", "--NumRead", "8000000",
                   "--ReadBatch", "8388608", "--Repeats", "2", "--NoProbe"]
    rc, log = run_step("final", ["bench.py", *final_args], env_tuned, outdir)
    final = parse_bench(log)
    with open(os.path.join(outdir, "final.json"), "w") as f:
        json.dump(final, f, indent=1)
    ladder["final"] = final
    if m8_args:
        run_step("bench_8m", ["bench.py", *m8_args], env_tuned, outdir)
        ladder["bench_8m"] = parse_bench(os.path.join(outdir, "bench_8m.log"))
    save()
    return 0


if __name__ == "__main__":
    sys.exit(main())
