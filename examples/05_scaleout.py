"""Scale-out: row-sharded data + vmapped λ-path sweeps.

New TPU-native capability (the reference is single-threaded Julia). Run
with 8 virtual devices to see the sharding without hardware:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/05_scaleout.py

(If the env vars don't take effect because jax was pre-imported, the
script forces them via jax.config itself.)
"""

import numpy as np


def main():
    import jax

    if len(jax.devices()) == 1 and jax.default_backend() != "tpu":
        # ensure a multi-device mesh for demonstration purposes
        jax.config.update("jax_num_cpu_devices", 8)

    import scso_tpu as scso
    from scso_tpu.models import losses, synthetic
    from scso_tpu.parallel import make_mesh, shard_problem, sweep

    m, n = 4096, 128
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        m, n, density=0.1, n_active=16, seed=7, dtype=np.float32,
        label01=True)
    prob = scso.Problem(A, y, x0, losses.logistic01_f, 0.01,
                        grad_fx=losses.logistic01_grad,
                        hvp_w=losses.logistic01_hvp_w,
                        glm=losses.LOGISTIC01_GLM, dtype=np.float32)
    # Armijo (ss_type=3): from a far random start the saturated-sigmoid
    # Newton step needs a line search to stay stable at small λ
    method = scso.ProxNSCORE(solver="cg", ss_type=3)
    sm = scso.PHuberSmootherL1L2(1.0)

    # 1. row-sharded solve: data parallel over all devices
    mesh = make_mesh()
    sol = scso.iterate(method, shard_problem(prob, mesh), "l1", sm,
                       max_epoch=50, verbose=0)
    print(f"row-sharded over {mesh.devices.size} devices:", sol)

    # 2. λ regularization path as ONE vmapped SPMD program
    bmesh = make_mesh(axis_names=("batch",))
    lam_grid = np.logspace(-4, -1, 8).astype(np.float32)
    res = sweep(method, prob, "l1", sm, lam_grid=lam_grid,
                opts=scso.Options(max_epoch=50, verbose=0), mesh=bmesh)
    nnz = (np.abs(res.x) > 1e-6).sum(axis=1)
    for lam, k, o in zip(lam_grid, nnz, res.obj):
        print(f"  λ={lam:.4f}  nnz={k:4d}  obj={o:.6f}")

    # 3. the same path with glmnet-style warm-started waves: sorted-λ
    # chunks, each starting from the previous wave's solutions (fewer
    # epochs per instance; one compiled program for all waves).
    # wave_max_epoch bounds the straggler tail of warm waves — warm-
    # started instances converge in a few epochs, so a tight cap cuts
    # the per-wave dispatch cost without losing the easy path points.
    resw = sweep(method, prob, "l1", sm, lam_grid=lam_grid,
                 opts=scso.Options(max_epoch=50, verbose=0),
                 path_waves=4, wave_max_epoch=20)
    print("cold epochs:", np.asarray(res.epochs).sum(),
          " warm-wave epochs:", np.asarray(resw.epochs).sum())
    # ... or let the plan rule decide from the measured dispatch latency:
    # sweep(..., plan='auto')

    # 4. sharded IO: data far beyond host RAM loads shard-by-shard from
    # disk (each host reads only its devices' memmap row slices); the
    # solve from disk bit-matches the in-memory sharded one
    import tempfile
    from scso_tpu.parallel import (load_problem_rows_sharded,
                                   save_problem_data)

    with tempfile.TemporaryDirectory() as d:
        save_problem_data(d, np.asarray(prob.A), np.asarray(prob.y))
        loaded = load_problem_rows_sharded(
            d, x0, losses.logistic01_f, 0.01, mesh,
            grad_fx=losses.logistic01_grad, hvp_w=losses.logistic01_hvp_w,
            glm=losses.LOGISTIC01_GLM)
        sol_disk = scso.iterate(method, loaded, "l1", sm, max_epoch=50,
                                verbose=0)
        print("solve-from-disk matches:",
              bool(np.array_equal(np.asarray(sol_disk.x),
                                  np.asarray(sol.x))))
    return res


if __name__ == "__main__":
    main()
