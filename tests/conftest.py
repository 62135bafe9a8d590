"""Test config: run everything on a virtual 8-device CPU mesh.

The ambient environment preloads jax via sitecustomize (PYTHONPATH
/root/.axon_site) and points it at the single tunneled TPU
(JAX_PLATFORMS=axon).  Setting env vars here is therefore too late for
the import, but the backend is only chosen at first use, so
``jax.config.update`` still wins — as long as no test touches a backend
before this file runs (pytest imports conftest before test modules).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: this host has ONE cpu core, so compile time
# dominates the suite; warm runs skip it entirely.  Scoped per CPU feature
# set — XLA:CPU AOT artifacts from a wider-ISA host can SIGILL here.
from selfreconcode_tpu import _machine_tag  # noqa: E402

_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache",
                          _machine_tag())
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
