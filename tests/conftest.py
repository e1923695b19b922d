"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding tests run on
``xla_force_host_platform_device_count=8`` CPU devices (see SURVEY.md §4).
Must run before jax is imported anywhere.
"""

import os

# Hard override: the container presets JAX_PLATFORMS=axon (single real TPU
# chip behind a tunnel, registered by a sitecustomize hook).  Tests must not
# contend for that chip and need deterministic f32 matmuls, so force CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize hook registers its backend before conftest runs and
# the env var alone does not win; the config holder does.
jax.config.update("jax_platforms", "cpu")

# The suite is dominated by XLA CPU compiles of tiny models; persist them.
_CACHE = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
