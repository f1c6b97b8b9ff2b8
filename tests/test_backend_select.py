"""select_backend fast paths (the probe branch needs a real tunnel and
is exercised by bench.py itself — validated live during an outage)."""

import os
import time

import jax

from scso_tpu.utils.backend import select_backend


def test_honors_in_process_cpu_config():
    """conftest sets jax_platforms='cpu' via jax.config — select_backend
    must return immediately without probing (no subprocess = fast)."""
    assert jax.config.jax_platforms == "cpu"  # test premise (conftest)
    t0 = time.perf_counter()
    assert select_backend() == "cpu"
    assert time.perf_counter() - t0 < 5.0  # no 180 s probe, no jax boot
    assert jax.config.jax_platforms == "cpu"


def test_honors_env_cpu_and_pops_it(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert select_backend() == "cpu"
    # popped: downstream code can't re-enter the hanging env-var route
    assert "JAX_PLATFORMS" not in os.environ
