#!/usr/bin/env python
"""Post-ladder TPU work queue (round 4), in priority order:

  1. engine_device_check — the engine-shaped per-flag device validation,
     run to completion with the chip otherwise idle (during the ladder it
     was timeout-killed at 3/6 flags).
  2. profile_match — jax.profiler trace of one tuned-flag batch; the top
     device fusions by self time drive the round's perf attack (the
     measured 5.1s/4M-read batch is ~2.2-3x the rate-model floor, so the
     gap lives in fusions the model does not see).
  3. mesh_sanity — 1x1 shard_map mesh vs plain engine at tuned flags
     (round-4 VERDICT item 8: within ~10%).
  4. batch-size ladder — 2M/8M/16M ReadBatch points (bench_8m covers 8M
     when the autotune final phase ran; this re-runs the sweep with the
     tuned defaults for the BENCH_r04 detail table).

Usage: python -u scripts/round4_post.py [outdir]   (default /tmp/round4_post)
Every step is a subprocess with a hard timeout; failures are recorded
and the queue continues.  Artifacts: outdir/<step>.log, outdir/post.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEP_TIMEOUT = int(os.environ.get("POST_STEP_TIMEOUT", "5400"))


def run_step(name, argv, outdir, timeout=STEP_TIMEOUT, env_over=None):
    log = os.path.join(outdir, f"{name}.log")
    env = dict(os.environ, PYTHONUNBUFFERED="1", **(env_over or {}))
    t0 = time.time()
    print(f"=== {name}: {' '.join(argv)}", flush=True)
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


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/round4_post"
    os.makedirs(outdir, exist_ok=True)
    post: dict = {}
    ppath = os.path.join(outdir, "post.json")

    def save():
        with open(ppath, "w") as f:
            json.dump(post, f, indent=1)

    rc, log = run_step(
        "engine_check", ["-m", "muscato_tpu.bench.engine_device_check"],
        outdir,
    )
    post["engine_check"] = {
        "exit": rc, "results": grab(log, "ENGINE_RESULTS "),
    }
    save()

    rc, log = run_step(
        "profile", ["-m", "muscato_tpu.bench.profile_match", "4"], outdir,
    )
    post["profile"] = {"exit": rc, "log": log}
    save()

    rc, log = run_step(
        "mesh_sanity", ["-m", "muscato_tpu.bench.mesh_sanity"], outdir,
    )
    post["mesh_sanity"] = {"exit": rc, "result": grab(log, "MESH_SANITY ")}
    save()

    for nm, batch in (("2m", 1 << 21), ("8m", 1 << 23), ("16m", 1 << 24)):
        nr = max(4_000_000, batch)
        rc, log = run_step(
            f"batch_{nm}",
            ["bench.py", "--Workload", "big", "--NumRead", str(nr),
             "--ReadBatch", str(batch), "--Repeats", "2", "--NoProbe"],
            outdir,
        )
        rec = None
        try:
            with open(log, errors="replace") as f:
                lines = [ln for ln in f if ln.startswith('{"metric"')]
            rec = json.loads(lines[-1]) if lines else None
        except Exception:
            pass
        post[f"batch_{nm}"] = rec
        save()
    print(json.dumps(post, indent=1)[:2000], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
