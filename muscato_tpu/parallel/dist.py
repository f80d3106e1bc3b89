"""Multi-host runtime initialization and mesh construction.

The reference has no distributed runtime (its IPC is Unix pipes,
/root/reference/cmd/muscato/main.go:55-58); this module is the entry point
for running the sharded engine (parallel/mesh.py) across TPU hosts:

  - `initialize()` wires `jax.distributed` from standard TPU pod
    environment variables (or explicit args) so every host sees the global
    device set;
  - `pod_mesh(dp, mp)` builds the 2-D mesh over all global devices, read
    data parallelism over "dp" and gene-range index shards over "mp";
  - hosts stream their local fastq shard (the engine's ReadBatch loop),
    and the shard_map collective merge (all_gather over both axes) keeps
    outputs bit-identical to a single-device run.

Single-host multi-chip needs no initialize(); `jax.devices()` already
shows the local chips.  The multi-host paths cannot be exercised in this
repo's single-chip environment — `__graft_entry__.dryrun_multichip`
validates the full sharded step on a virtual device mesh instead.
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


def process_read_range(num_unique: int) -> tuple[int, int]:
    """The contiguous unique-read range this host should stream
    (data-parallel input pipeline: each host reads its own fastq shard)."""
    pid = jax.process_index()
    pn = jax.process_count()
    per = -(-num_unique // pn)
    lo = min(pid * per, num_unique)
    return lo, min(lo + per, num_unique)
