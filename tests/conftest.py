"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding is validated on a
host-platform device mesh per SURVEY.md §4 (test strategy).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize forces jax_platforms="axon,cpu" at interpreter
# start; override back to CPU for deterministic multi-device CI
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, (
    "tests require the virtual 8-device CPU mesh; got "
    + str(jax.devices()))
