#!/usr/bin/env python
"""Round-5 TPU work queue, in priority order (VERDICT round-4 items):

  1. profile      — jax.profiler trace of one tuned-flag 8M-read batch:
                    fresh per-fusion table to localize the 2.7s
                    expand_verify and 0.8s rank terms (VERDICT weak #1).
  2. mg_spos      — MUSCATO_MG_SPOS=1 A/B on the big workload, now that
                    f98b6d3 made the postings stream monotone on every
                    probe (VERDICT next #1's missing device number).
  3. vchunk_2m    — MUSCATO_VCHUNK=2M A/B (the verify chunk while-loop
                    was 0.84s/8M batch at 1M lanes; VERDICT next #2).
  4. prefetch_ab  — 8M reads in 2x4M batches with probe prefetch on vs
                    off (VERDICT next #6: the cheap half of the 8M-batch
                    win without the 8M footprint).
  5. engine_check — engine-shaped per-flag device validation run to
                    completion (PEXPAND + full combo; VERDICT next #3a).
  6. mesh_sanity  — 1x1 shard_map mesh vs plain engine on TPU
                    (VERDICT next #3c).
  7. batch_16m    — the 16M ReadBatch point (VERDICT next #3d).

Usage: python -u scripts/round5_queue.py [outdir]  (default /tmp/round5_q)
Every step is a subprocess with a hard timeout; failures are recorded and
the queue continues.  Artifacts: outdir/<step>.log, outdir/queue.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEP_TIMEOUT = int(os.environ.get("Q_STEP_TIMEOUT", "4200"))


def run_step(name, argv, outdir, timeout=STEP_TIMEOUT, env_over=None):
    log = os.path.join(outdir, f"{name}.log")
    env = dict(os.environ, PYTHONUNBUFFERED="1", **(env_over or {}))
    t0 = time.time()
    print(f"=== {name}: {' '.join(argv)} env={env_over}", flush=True)
    try:
        with open(log, "wb") as f:
            r = subprocess.run(
                [sys.executable, "-u", *argv], cwd=REPO, env=env,
                stdout=f, stderr=subprocess.STDOUT, timeout=timeout,
            )
        rc = r.returncode
    except subprocess.TimeoutExpired:
        rc = -9
    print(f"    exit={rc} ({time.time() - t0:.0f}s)", flush=True)
    return rc, log


def grab_metric(log):
    rec = None
    try:
        with open(log, errors="replace") as f:
            lines = [ln for ln in f if ln.startswith('{"metric"')]
        rec = json.loads(lines[-1]) if lines else None
    except Exception:
        pass
    return rec


def grab(log, prefix):
    out = None
    try:
        with open(log, errors="replace") as f:
            for ln in f:
                if ln.startswith(prefix):
                    out = json.loads(ln[len(prefix):])
    except Exception:
        pass
    return out


BENCH_BIG = ["bench.py", "--Workload", "big", "--Repeats", "2", "--NoProbe"]


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/round5_q"
    os.makedirs(outdir, exist_ok=True)
    q: dict = {}
    qpath = os.path.join(outdir, "queue.json")

    def save():
        with open(qpath, "w") as f:
            json.dump(q, f, indent=1)

    rc, log = run_step(
        "profile", ["-m", "muscato_tpu.bench.profile_match", "8"], outdir,
    )
    q["profile"] = {"exit": rc, "log": log}
    save()

    rc, log = run_step(
        "mg_spos", BENCH_BIG, outdir, env_over={"MUSCATO_MG_SPOS": "1"},
    )
    q["mg_spos"] = {"exit": rc, "rec": grab_metric(log)}
    save()

    rc, log = run_step(
        "vchunk_2m", BENCH_BIG, outdir,
        env_over={"MUSCATO_VCHUNK": str(1 << 21)},
    )
    q["vchunk_2m"] = {"exit": rc, "rec": grab_metric(log)}
    save()

    for nm, on in (("prefetch_on", "1"), ("prefetch_off", "0")):
        rc, log = run_step(
            nm, BENCH_BIG + ["--ReadBatch", str(1 << 22)], outdir,
            env_over={"MUSCATO_PREFETCH_PROBE": on},
        )
        q[nm] = {"exit": rc, "rec": grab_metric(log)}
        save()

    rc, log = run_step(
        "engine_check", ["-m", "muscato_tpu.bench.engine_device_check"],
        outdir,
    )
    q["engine_check"] = {"exit": rc, "results": grab(log, "ENGINE_RESULTS ")}
    save()

    rc, log = run_step(
        "mesh_sanity", ["-m", "muscato_tpu.bench.mesh_sanity"], outdir,
    )
    q["mesh_sanity"] = {"exit": rc, "result": grab(log, "MESH_SANITY ")}
    save()

    rc, log = run_step(
        "batch_16m",
        ["bench.py", "--Workload", "big", "--NumRead", str(1 << 24),
         "--ReadBatch", str(1 << 24), "--Repeats", "2", "--NoProbe"],
        outdir,
    )
    q["batch_16m"] = {"exit": rc, "rec": grab_metric(log)}
    save()
    print(json.dumps(q, indent=1)[:3000], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
