"""Test configuration.

Tests run JAX on CPU with 8 virtual devices so the multi-chip sharding path
is exercised without TPU hardware (the driver separately dry-runs the mesh
path; see __graft_entry__.py).

Note: this machine's site hook (sitecustomize) imports jax and pins
JAX_PLATFORMS=axon before pytest starts, so plain env defaulting is too
late; override through jax.config instead, and set XLA_FLAGS before the
first backend initialization (it is read lazily).
"""

import os

# Tests pin the engine-kernel defaults OFF (measured TPU defaults in
# muscato_tpu/TUNED.json now enable Pallas kernels, which on the CPU
# backend run in interpret mode — orders of magnitude slower, and the
# golden suite would balloon).  Kernel coverage on CPU stays explicit:
# test_pallas.py oracles, test_dist.py mesh-with-kernels equivalence,
# test_tuned.py precedence; silicon coverage is bench/engine_device_check.
os.environ.setdefault("MUSCATO_TUNED", "/nonexistent")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

REFERENCE_DATA = "/root/reference/tests/data"
