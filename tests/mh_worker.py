"""Multi-host test worker: one OS process of a 2-process CPU 'pod'.

Invoked by tests/test_multihost.py as
    python mh_worker.py <process_id> <num_processes> <port> <outdir>

Each process owns 4 virtual CPU devices; jax.distributed + Gloo provide
the cross-process collectives, so the sharded engine runs exactly the
multi-host code path it would on a TPU pod (global jax.Arrays staged per
process, all_gather over "mp" inside shard_map, process-level merge of
retained rows).  Every process writes its MatchResult so the test can
assert cross-process agreement and parity with the single-device engine.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from muscato_tpu.parallel import dist

    dist.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert len(jax.devices()) == 4 * nproc

    import numpy as np
    from test_dist import _mk_sets
    from muscato_tpu.config import Config
    from muscato_tpu.parallel import mesh as pmesh

    rng = np.random.default_rng(17)
    width, max_rl = 6, 40
    cfg = Config(
        Windows=[0, 4], WindowWidth=width, PMatch=0.9, MinDinuc=1,
        MaxReadLength=max_rl, MMTol=1, MaxMatches=10**6, MatchMode="best",
    )
    rs, ts = _mk_sets(rng, n_reads=43, n_genes=12, width=width, max_rl=max_rl)

    mesh = dist.pod_mesh(dp=2, mp=4)
    sidx = pmesh.shard_targets(ts, width, 4)
    mr = pmesh.run_matching_sharded(cfg, rs, sidx, mesh)

    assert dist.is_primary() == (pid == 0)
    np.savez(
        os.path.join(outdir, f"mr_{pid}.npz"),
        read_row=mr.read_row, gene=mr.gene, start=mr.start, nmiss=mr.nmiss,
    )
    print(f"worker {pid} OK: {len(mr.read_row)} matches", flush=True)


if __name__ == "__main__":
    main()
