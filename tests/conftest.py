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


def pytest_collection_modifyitems(config, items):
    """Run the heaviest-compiling modules FIRST: XLA:CPU's compiler segfaults
    non-deterministically when very large EC kernels compile late in a
    process that has already JITed dozens of other kernels (observed
    reproducibly at ~70 tests in; every module passes when compiled early
    or solo). Fresh-process compile order dodges the bug."""
    heavy = ("test_prove_mesh", "test_prove_batch", "test_groth16",
             "test_ec")

    def rank(item):
        name = item.module.__name__ if item.module else ""
        for i, h in enumerate(heavy):
            if h in name:
                return i
        return len(heavy)

    items.sort(key=rank)
# NOTE: the persistent compilation cache is deliberately NOT enabled for the
# CPU test mesh: XLA:CPU executable (de)serialization segfaults on the largest
# EC kernels in this jaxlib (crash inside compilation_cache.put/get_executable)
# — observed reproducibly on the G2 MSM step. Tests pay fresh compiles instead.
# The TPU bench path keeps its own cache (.jax_cache_tpu), which is stable.
assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8
