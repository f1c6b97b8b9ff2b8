"""Test configuration: CPU backend with 8 virtual devices + float64.

Tests run on an 8-device virtual CPU mesh (so sharding/psum code paths are
exercised without TPU hardware) and with x64 enabled (the reference is
Float64 Julia; its oracle tolerances of 1e-6/1e-10 need f64).

Note: plain env vars don't work here — the harness pre-imports jax under
the 'axon' TPU platform before conftest runs, so we use config updates,
which take effect as long as no backend has been initialized yet.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
