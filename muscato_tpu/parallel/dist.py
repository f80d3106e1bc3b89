"""Multi-host runtime initialization and mesh construction.

The reference has no distributed runtime (its IPC is Unix pipes,
/root/reference/cmd/muscato/main.go:55-58); this module is the entry point
for running the sharded engine (parallel/mesh.py) across TPU hosts:

  - `initialize()` wires `jax.distributed` from standard TPU pod
    environment variables (or explicit args) so every host sees the global
    device set; the driver calls it when `--Coordinator`/`--ProcessCount`
    are set (engine/driver.py);
  - `pod_mesh(dp, mp)` builds the 2-D mesh over all global devices, read
    data parallelism over "dp" and gene-range index shards over "mp";
  - every host parses the same inputs (read dedup is global, so each host
    needs the full unique read set) and executes the same global batches;
    parallel/mesh.py stages them as global jax.Arrays
    (make_array_from_callback) so each process feeds only its addressable
    devices, and the retained rows cross hosts once per batch over the
    process collective (mesh._addressable_by_dp + process_allgather);
  - process 0 alone writes the report files.

Single-host multi-chip needs no initialize(); `jax.devices()` already
shows the local chips.  The true multi-process path is exercised by
tests/test_multihost.py (2 OS processes x 4 virtual CPU devices, Gloo
collectives); `__graft_entry__.dryrun_multichip` additionally validates
the sharded step on a single-process virtual mesh.
"""

from __future__ import annotations

import jax

from .mesh import make_mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed for a multi-host run.

    With no arguments, relies on the TPU pod runtime's automatic
    environment discovery (the standard path on Cloud TPU slices).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def pod_mesh(dp: int | None = None, mp: int | None = None):
    """A ("dp", "mp") mesh over all global devices.

    Defaults: shard the index over every device (mp = device count,
    dp = 1); pass explicit factors to trade read-parallelism against
    index-shard size (dp * mp must equal the device count used).
    """
    n = len(jax.devices())
    if dp is None and mp is None:
        dp, mp = 1, n
    elif dp is None:
        dp = n // mp
    elif mp is None:
        mp = n // dp
    return make_mesh(dp, mp)


def is_primary() -> bool:
    """True on the process that owns report/file output (the driver skips
    result writing elsewhere; all processes compute identical results)."""
    return jax.process_index() == 0
