"""Test configuration.

Tests run JAX on CPU with 8 virtual devices so the multi-chip sharding path
is exercised without TPU hardware (the driver separately dry-runs the mesh
path; see __graft_entry__.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REFERENCE_DATA = "/root/reference/tests/data"
