"""Outage-safe JAX platform selection for driver-facing entry points.

The axon TPU backend initializes through a tunnel that can go down —
and a dead tunnel HANGS backend init for ~30 minutes (plugin-internal
retries) instead of erroring. Worse, the environment's sitecustomize
monkey-patches ``get_backend``, so even ``JAX_PLATFORMS=cpu`` via the
ENV VAR still blocks in plugin discovery; only
``jax.config.update("jax_platforms", ...)`` applied before the first
backend touch reliably avoids the plugin (measured on a live outage).

:func:`select_backend` wraps the working recipe: probe the default
backend in a subprocess under a timeout, then route the final platform
choice through ``jax.config``. Call it BEFORE any jax operation that
touches a backend (plain ``import jax`` is safe).
"""

from __future__ import annotations

import os
import subprocess
import sys


def select_backend(probe_timeout: float = 180.0) -> str:
    """Choose a usable platform; returns what was selected.

    * an explicit CPU-only request — ``JAX_PLATFORMS=cpu`` in the env
      OR a prior ``jax.config.update("jax_platforms", "cpu")`` — is
      honored immediately via the config route (no probe);
    * anything else: the default backend is probed in a subprocess
      under ``probe_timeout`` seconds; on failure the process falls
      back to CPU, on success the env's choice (if any) is re-applied
      through the config route.

    The env var is popped either way so nothing downstream re-enters
    the hanging env-var code path.
    """
    env_platforms = os.environ.pop("JAX_PLATFORMS", None)

    import jax  # plain import is safe — no backend init

    # Honor an explicit CPU-only request from EITHER source without
    # probing: an in-process jax.config.update("jax_platforms", "cpu")
    # (tests, wrappers — in-process intent beats the shell env) or the
    # env var. Reading the config is safe; its default here is
    # 'axon,cpu' (set by the environment's sitecustomize), which is NOT
    # an explicit choice and still needs the probe.
    cfg = getattr(jax.config, "jax_platforms", None) or ""
    if cfg == "cpu" or env_platforms == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return "cpu"

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=probe_timeout, check=True, capture_output=True)
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        print("scso_tpu: accelerator backend unavailable — "
              "falling back to CPU", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        return "cpu"

    if env_platforms is not None:
        jax.config.update("jax_platforms", env_platforms)
        return env_platforms
    return "auto"
