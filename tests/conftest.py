"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no test suite (SURVEY.md §4); this harness is our TPU-native
equivalent of a fake distributed backend — multi-chip sharding logic runs on
XLA's host platform with 8 virtual devices.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# A sitecustomize module may have imported jax and registered a TPU PJRT
# plugin before this conftest runs, in which case the env var alone is
# ignored.  Force the platform through the runtime config too, before any
# backend is initialized by test imports.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by CPU jit compiles
# (2-core box); cache them across runs.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(43)
