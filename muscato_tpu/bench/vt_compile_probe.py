"""Find the scale at which the vtail probe-slot compaction wedges the
relay compiler (rounds 3 AND 4 both saw MUSCATO_VTAIL=1 sort-merge-probe
steps hang with frozen CPU time — the relay-deadlock signature — while
the same flag compiles fine inside the pjoin probe, whose compaction runs
at Q=16M lanes instead of V+Q=116M).

Compiles (never runs) _probe_windows_impl with vtail=1 against index
sizes stepping up to the big workload's 98M rows, each under an alarm
timeout, and prints PASS/HANG per size.

Run: python -u -m muscato_tpu.bench.vt_compile_probe [sizes_millions...]
"""

from __future__ import annotations

import signal
import sys
import time


def main(argv=None) -> int:
    from ..cli import _apply_platform_override

    _apply_platform_override()
    sizes = [float(x) for x in (argv or sys.argv[1:])] or [2, 8, 32, 98]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops import fused
    from ..ops import packed as pops

    print(f"backend={jax.default_backend()}", flush=True)
    fused.set_vtail(True)
    rng = np.random.default_rng(0)
    nreads, l_eff, width = 1 << 16, 104, 20
    codes = rng.integers(0, 4, (nreads, l_eff), dtype=np.uint8)
    rpacked = jnp.asarray(pops.pack_rows_np(codes))
    lengths = jnp.full(nreads, l_eff, jnp.int32)
    q1s = jnp.asarray([10, 30, 50, 70], jnp.int32)

    per_size_timeout = int(
        float(__import__("os").environ.get("VT_PROBE_TIMEOUT", "600"))
    )
    for m in sizes:
        v = int(m * 1e6)
        # The engine's index keys are a 1-D sorted uint32 array
        # (engine/index.py skeys) — the probe impl concatenates them
        # with the flat query keys before the merge sort.
        k1 = np.sort(
            rng.integers(0, 1 << 32, v, dtype=np.uint64).astype(np.uint32)
        )
        skeys = jnp.asarray(k1)
        probe = fused._tpu_jit(
            fused._probe_windows_impl,
            ("width", "min_dinuc", "vtail", "interpret"),
        )

        def _hang(signum, frame):
            raise TimeoutError()

        signal.signal(signal.SIGALRM, _hang)
        signal.alarm(per_size_timeout)
        t0 = time.time()
        try:
            lowered = probe.lower(
                rpacked, lengths, q1s, skeys, None, None, None,
                width=width, min_dinuc=3, vtail=True, interpret=False,
            )
            lowered.compile()
            print(f"PASS V={m}M compile {time.time()-t0:.1f}s", flush=True)
        except TimeoutError:
            print(f"HANG V={m}M (> {per_size_timeout}s)", flush=True)
            return 1
        except Exception as e:
            print(f"FAIL V={m}M {type(e).__name__}: {e!r:.300}", flush=True)
        finally:
            signal.alarm(0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
