"""Test config: force an 8-virtual-device CPU backend.

This is the multi-chip-without-a-cluster strategy (SURVEY.md §4): pjit /
shard_map tests run against a faked 8-device mesh on CPU — the TPU analogue
of a fake backend — and unit tests stay deterministic/fast.

NOTE: this environment's sitecustomize registers the experimental `axon` TPU
plugin and calls jax.config.update("jax_platforms", "axon,cpu") at interpreter
start, which overrides JAX_PLATFORMS env vars. We must undo it via jax.config
AFTER importing jax (backends initialize lazily, so this is safe as long as
no jax op ran yet).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return (f"jax backend: {jax.default_backend()} "
            f"devices: {jax.device_count()}")
