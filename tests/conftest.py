"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding is validated on a
host-platform device mesh per SURVEY.md §4 (test strategy).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
