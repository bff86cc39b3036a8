"""Test config: force an 8-virtual-device CPU backend BEFORE jax imports.

This is the multi-chip-without-a-cluster strategy (SURVEY.md §4): pjit /
shard_map tests run against a faked 8-device mesh on CPU, the TPU analogue of
a fake backend. Must run before any jax import, which pytest guarantees for
conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
