#!/bin/bash
# Round-3 measurement sweep (run when the TPU relay is reachable).
# Usage: bash scripts/measure_r3.sh [outdir]
# Sequential, unbuffered, one log per step; each step is its own process
# so a hang or OOM cannot take down the sweep.  Supersedes measure_r2.sh.
set -u
OUT=${1:-/tmp/measure_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# step NAME "FLAG=1 FLAG=0" ARGS... — flags are passed via env(1) so they
# cannot leak between steps (bash makes `VAR=1 funcname` assignments
# persist after the function returns, which would contaminate the ladder).
step() {
  name=$1; flags=$2; shift 2
  echo "=== $name: [$flags] $* ($(date +%H:%M:%S))" | tee -a "$OUT/sweep.log"
  # shellcheck disable=SC2086
  timeout 5400 env $flags python -u "$@" >"$OUT/$name.log" 2>&1
  echo "    exit=$? ($(date +%H:%M:%S))" | tee -a "$OUT/sweep.log"
}

# 0. FIRST TPU MINUTE: surface Mosaic compile errors in the Pallas kernels
#    before anything else (round-2 VERDICT weak #5).  conftest pins tests
#    to CPU, so drive the kernels directly on the device.
step pallas_compile "" -m muscato_tpu.bench.pallas_device_check

# 1. headline A/B ladder on the big workload.  Every step pins ALL three
#    flags (0 is an explicit pin, in case TUNED.json flips defaults).
AB="MUSCATO_MGATHER=0 MUSCATO_PJOIN=0 MUSCATO_DORDER=0"
step bench_xla "$AB" bench.py --Workload big --Repeats 3
step bench_mg "MUSCATO_MGATHER=1 MUSCATO_PJOIN=0 MUSCATO_DORDER=0" bench.py --Workload big --Repeats 3
step bench_pj "MUSCATO_MGATHER=0 MUSCATO_PJOIN=1 MUSCATO_DORDER=0" bench.py --Workload big --Repeats 3
step bench_do "MUSCATO_MGATHER=0 MUSCATO_PJOIN=0 MUSCATO_DORDER=1" bench.py --Workload big --Repeats 3
step bench_mg_do "MUSCATO_MGATHER=1 MUSCATO_PJOIN=0 MUSCATO_DORDER=1" bench.py --Workload big --Repeats 3
step bench_mg_pj "MUSCATO_MGATHER=1 MUSCATO_PJOIN=1 MUSCATO_DORDER=0" bench.py --Workload big --Repeats 3
step bench_all "MUSCATO_MGATHER=1 MUSCATO_PJOIN=1 MUSCATO_DORDER=1" bench.py --Workload big --Repeats 3
step bench_vt "MUSCATO_MGATHER=0 MUSCATO_PJOIN=0 MUSCATO_DORDER=0 MUSCATO_VTAIL=1" bench.py --Workload big --Repeats 3
step bench_all_vt "MUSCATO_MGATHER=1 MUSCATO_PJOIN=1 MUSCATO_DORDER=1 MUSCATO_VTAIL=1" bench.py --Workload big --Repeats 3
step bench_px "MUSCATO_MGATHER=0 MUSCATO_PJOIN=0 MUSCATO_DORDER=0 MUSCATO_PEXPAND=1" bench.py --Workload big --Repeats 3
step bench_full "MUSCATO_MGATHER=1 MUSCATO_PJOIN=1 MUSCATO_DORDER=1 MUSCATO_VTAIL=1 MUSCATO_PEXPAND=1" bench.py --Workload big --Repeats 3
# 2. phase breakdown at 4M reads
step profile_xla "$AB" -m muscato_tpu.bench.profile_match 4
step profile_mg_do "MUSCATO_MGATHER=1 MUSCATO_PJOIN=0 MUSCATO_DORDER=1" -m muscato_tpu.bench.profile_match 4
# 3. batch-size scaling (8M reads, one batch) — amortizes the probe sort
step bench_8m "" bench.py --Workload big --NumRead 8000000 --ReadBatch 8388608 --Repeats 2
# 4. small workload for continuity
step bench_small "" bench.py --Workload small --Repeats 3
grep -h '"metric"' "$OUT"/bench_*.log | tee -a "$OUT/sweep.log"
