"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without real hardware via
--xla_force_host_platform_device_count (SURVEY.md §4 item 5); the driver
separately dry-run-compiles the multi-chip path via __graft_entry__.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
