"""Dry-run the full autotune sweep (scripts/autotune_r3.py) on CPU.

Validates the orchestration end-to-end — subprocess steps, JSON-line
parsing, winner selection, TUNED.json write, tuned confirmation run —
with a tiny workload, so the script cannot crash when a real relay
uptime window finally opens."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "autotune_r3.py")


def test_autotune_dry_run(tmp_path):
    outdir = tmp_path / "out"
    tuned = tmp_path / "TUNED.json"
    env = dict(
        os.environ,
        MUSCATO_PLATFORM="cpu",
        AUTOTUNE_ACCEPT_CPU="1",
        AUTOTUNE_SKIP_PALLAS="1",
        AUTOTUNE_LADDER="do,xla",
        AUTOTUNE_STEP_TIMEOUT="600",
        AUTOTUNE_TUNED_PATH=str(tuned),
        AUTOTUNE_BENCH_ARGS=(
            "--Workload small --NumRead 5000 --NumGene 50 "
            "--Repeats 1 --NoProbe"
        ),
    )
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-u", SCRIPT, str(outdir)],
        env=env, capture_output=True, text=True, timeout=1500, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    ladder = json.loads((outdir / "ladder.json").read_text())
    for step in ("do", "xla"):
        rec = ladder[step]
        assert rec["metric"] == "reads_per_sec_cpu_fallback"
        assert rec["skipped"] is True  # CPU can never look like a chip
        assert rec["detail"]["backend"] == "cpu"
    # do ran with MUSCATO_DORDER=1 and the provenance recorded it
    assert ladder["do"]["detail"]["flags"]["MUSCATO_DORDER"] == 1
    assert ladder["xla"]["detail"]["flags"]["MUSCATO_DORDER"] == 0

    t = json.loads(tuned.read_text())
    assert set(t["flags"]) == {
        "MUSCATO_MGATHER", "MUSCATO_PJOIN", "MUSCATO_DORDER",
        "MUSCATO_PEXPAND",
    }
    assert t["provenance"]["winner"] in ("do", "xla")
    assert (outdir / "ladder.md").exists()
    assert ladder["final"]["detail"]["backend"] == "cpu"
