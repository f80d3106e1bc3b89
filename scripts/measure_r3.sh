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

# 1. headline A/B ladder on the big workload.  Every step pins ALL FIVE
#    engine flags (0 is an explicit pin — TUNED.json may flip defaults
#    after an autotune run, which would otherwise contaminate baselines).
Z="MUSCATO_MGATHER=0 MUSCATO_PJOIN=0 MUSCATO_DORDER=0 MUSCATO_VTAIL=0 MUSCATO_PEXPAND=0"
pin() {  # pin NAME=1... on top of the all-zero base
  out="$Z"
  for f in "$@"; do out="$out $f=1"; done
  echo "$out"
}
step bench_xla "$Z" bench.py --Workload big --Repeats 3
step bench_mg "$(pin MUSCATO_MGATHER)" bench.py --Workload big --Repeats 3
step bench_pj "$(pin MUSCATO_PJOIN)" bench.py --Workload big --Repeats 3
step bench_do "$(pin MUSCATO_DORDER)" bench.py --Workload big --Repeats 3
step bench_vt "$(pin MUSCATO_VTAIL)" bench.py --Workload big --Repeats 3
step bench_px "$(pin MUSCATO_PEXPAND)" bench.py --Workload big --Repeats 3
step bench_mg_do "$(pin MUSCATO_MGATHER MUSCATO_DORDER)" bench.py --Workload big --Repeats 3
step bench_mg_pj "$(pin MUSCATO_MGATHER MUSCATO_PJOIN)" bench.py --Workload big --Repeats 3
step bench_vt_px "$(pin MUSCATO_VTAIL MUSCATO_PEXPAND)" bench.py --Workload big --Repeats 3
step bench_all "$(pin MUSCATO_MGATHER MUSCATO_PJOIN MUSCATO_DORDER)" bench.py --Workload big --Repeats 3
step bench_all_vt "$(pin MUSCATO_MGATHER MUSCATO_PJOIN MUSCATO_DORDER MUSCATO_VTAIL)" bench.py --Workload big --Repeats 3
step bench_full "$(pin MUSCATO_MGATHER MUSCATO_PJOIN MUSCATO_DORDER MUSCATO_VTAIL MUSCATO_PEXPAND)" bench.py --Workload big --Repeats 3
# 2. phase breakdown at 4M reads
step profile_xla "$Z" -m muscato_tpu.bench.profile_match 4
step profile_full "$(pin MUSCATO_MGATHER MUSCATO_PJOIN MUSCATO_DORDER MUSCATO_VTAIL MUSCATO_PEXPAND)" -m muscato_tpu.bench.profile_match 4
# 3. batch-size scaling (8M reads, one batch) — runs with TUNED defaults
#    on purpose (the tuned config is what the driver's bench.py measures)
step bench_8m "" bench.py --Workload big --NumRead 8000000 --ReadBatch 8388608 --Repeats 2
# 4. small workload for continuity (TUNED defaults, same reason)
step bench_small "" bench.py --Workload small --Repeats 3
grep -h '"metric"' "$OUT"/bench_*.log | tee -a "$OUT/sweep.log"
