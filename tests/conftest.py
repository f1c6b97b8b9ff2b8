"""Test configuration: CPU backend with 8 virtual devices + float64.

Tests run on an 8-device virtual CPU mesh (so sharding/psum code paths are
exercised without TPU hardware) and with x64 enabled (the reference is
Float64 Julia; its oracle tolerances of 1e-6/1e-10 need f64).

Note: plain env vars don't work here — the harness pre-imports jax under
the 'axon' TPU platform before conftest runs, so we use config updates,
which take effect as long as no backend has been initialized yet.
"""

import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The full suite compiles ~1000 distinct XLA CPU programs in one
    process; with all of them held alive, the CPU backend's JIT has been
    observed to segfault inside backend_compile_and_load partway through
    the run (flaky, position varies, observed on the 6.18.5-fc VM
    kernel). Releasing executables module-by-module keeps the resident
    JIT footprint bounded; cross-module cache reuse is minimal anyway
    (distinct shapes/configs), so the wall-clock cost is small.
    """
    yield
    jax.clear_caches()
