"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's test strategy (SURVEY.md §4): tests run the real provers
on small instances; multi-chip sharding is validated on a virtual CPU mesh since
only one physical TPU chip is available in CI.

Note: this environment pre-registers the `axon` TPU PJRT plugin via
sitecustomize and pins JAX_PLATFORMS=axon, so the env var alone cannot force
CPU; we must override via jax.config before any backend is initialized.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the big fused field/EC graphs are expensive for
# XLA:CPU to compile; cache them across test runs (and across build rounds).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8
