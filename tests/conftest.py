"""Test config: force an 8-device virtual CPU mesh before jax initializes.

Multi-device sharding tests (cross-replica NT-Xent, pjit train step) run on
this host mesh; real-TPU perf is exercised by bench.py instead.
"""
import os

# Force, don't setdefault: the harness environment bakes JAX_PLATFORMS=axon
# (remote TPU tunnel) and a sitecustomize that registers the plugin; tests
# must run on the local 8-device virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The baked sitecustomize registers the axon TPU plugin and stomps
# jax_platforms at interpreter start; the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must not run on the TPU tunnel"
assert len(jax.devices()) == 8, "expected the 8-device virtual CPU mesh"

# Persistent compilation cache: compile times dominate on the 1-core test
# box; cached executables make re-runs ~free.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
