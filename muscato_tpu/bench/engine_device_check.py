"""Engine-shaped on-device kernel validation (round-4 VERDICT item 5).

The round-3 pexpand fault proved that synthetic per-kernel device checks
(bench/pallas_device_check.py) can pass while engine-shaped inputs crash
the TPU worker: the engine's compacted slot arrays carry a dead tail the
synthetic all-live slots never exercised.  This check closes that gap by
running the REAL engine end-to-end on a realistic workload, once per
kernel flag, and asserting the retained match set is identical to the
XLA-only run.  Every kernel therefore sees exactly the distributions the
probe and expand stages emit — dead tails, skewed runs, duplicate keys —
on real silicon.

Run:  python -m muscato_tpu.bench.engine_device_check [--NumRead N]

Prints one `ENGINE_RESULTS {json}` line mapping flag -> true/false and
exits nonzero on any mismatch or fault.  scripts/autotune_r3.py runs this
as ladder step 0b; a failing flag's ladder steps are skipped.

The kernel safety net is disabled for the duration (MUSCATO_KERNEL_NET=0)
so a kernel fault surfaces as a loud failure of its flag, never as a
silent fallback to the XLA path that would vacuously "pass".
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ["MUSCATO_KERNEL_NET"] = "0"
# The check validates explicit flag settings; a TUNED.json must not
# pre-enable kernels during the reference (XLA-only) run.
os.environ.setdefault("MUSCATO_TUNED", "/nonexistent")

import numpy as np  # noqa: E402


def _set_flags(mg=False, pj=False, do=False, px=False,
               sub=False, block=1024, fixup=64) -> None:
    from ..ops import fused

    fused.set_mgather(mg)
    fused.set_pjoin(pj)
    fused.set_dorder(do)
    fused.set_pexpand(px)
    fused._PEXPAND_SUB[0] = sub
    fused._MG_BLOCK = block
    fused._MG_FIXUP = fixup
    # Reset overflow-grown scales so every config compiles the same
    # static shapes it would see in a fresh process.
    fused.set_mg_scale(1)
    fused.set_pjoin_scale(1)


# flag name -> fused setter kwargs; "full" proves flag interaction.
# The round-5 knob rows (MG_BLOCK / PEXPAND_SUB / the hybrid
# span-overflow fixup) exist so tune_finish's engine-check gate covers
# them: a knob may only default on with an engine-shaped device pass.
# (MUSCATO_SEGSCAN was deleted: compile-bound DNF on device, see
# BENCHMARKS.md round-5 phase 3.)
CONFIGS = [
    ("MUSCATO_MGATHER", dict(mg=True)),
    ("MUSCATO_PJOIN", dict(pj=True)),
    ("MUSCATO_DORDER", dict(do=True)),
    ("MUSCATO_PEXPAND", dict(px=True)),
    ("MUSCATO_PEXPAND_SUB", dict(px=True, sub=True)),
    ("MUSCATO_MG_BLOCK", dict(mg=True, do=True, block=4096)),
    ("full", dict(mg=True, pj=True, do=True, px=True)),
    ("full_knobs", dict(mg=True, pj=True, do=True, px=True,
                        sub=True, block=4096)),
]


def _canon(mr) -> np.ndarray:
    rows = np.stack(
        [np.asarray(mr.read_row), np.asarray(mr.gene),
         np.asarray(mr.start), np.asarray(mr.nmiss)], axis=1
    )
    order = np.lexsort((rows[:, 3], rows[:, 2], rows[:, 1], rows[:, 0]))
    return rows[order]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--NumRead", type=int, default=500_000)
    p.add_argument("--ReadLen", type=int, default=100)
    p.add_argument("--NumGene", type=int, default=20_000)
    p.add_argument("--GeneLen", type=int, default=1_000)
    p.add_argument("--ReadBatch", type=int, default=0,
                   help="0 = pipeline default; set below NumRead to also "
                        "exercise the multi-batch cap/rank path")
    ns = p.parse_args(argv)

    from ..cli import _apply_platform_override

    _apply_platform_override()  # MUSCATO_PLATFORM=cpu for dry runs

    import jax

    from ..config import Config
    from ..engine import pipeline
    from ..engine.index import build_target_index
    from . import gendat

    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)

    cfg = Config(
        Windows=[10, 30, 50, 70], WindowWidth=20, PMatch=0.96,
        MinDinuc=3, MaxReadLength=ns.ReadLen * 2, MMTol=2,
        MaxMatches=10**6, MatchMode="best", ReadBatch=ns.ReadBatch,
    )
    rs, ts = gendat.generate_arrays_realistic(
        ns.NumRead, ns.ReadLen, ns.NumGene, ns.GeneLen, seed=7
    )
    index = build_target_index(ts, cfg.WindowWidth)
    index.skeys.block_until_ready()

    _set_flags()
    ref = _canon(pipeline.run_matching_indexed(cfg, rs, index))
    print(f"XLA reference: {len(ref)} retained matches", flush=True)
    if not len(ref):
        print("workload produced zero matches — check is vacuous",
              flush=True)
        return 2

    results: dict[str, bool] = {}
    for name, kw in CONFIGS:
        _set_flags(**kw)
        try:
            got = _canon(pipeline.run_matching_indexed(cfg, rs, index))
            ok = got.shape == ref.shape and bool(np.array_equal(got, ref))
            if not ok:
                print(f"FAIL {name}: {len(got)} rows vs {len(ref)} "
                      f"reference rows (engine-shaped mismatch)", flush=True)
        except Exception as e:
            ok = False
            print(f"FAIL {name}: {type(e).__name__}: {e!r:.400}", flush=True)
        results[name] = ok
        print(f"{'PASS' if ok else 'FAIL'} engine[{name}]", flush=True)
    _set_flags()

    out = {
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "backend": jax.default_backend(),
        "num_read": ns.NumRead,
        "reference_matches": int(len(ref)),
        "results": results,
    }
    print("ENGINE_RESULTS " + json.dumps(results), flush=True)
    print("ENGINE_DETAIL " + json.dumps(out), flush=True)
    return 0 if all(results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
