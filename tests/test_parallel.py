"""Scale-out tests on the 8-device virtual CPU mesh.

The reference has no parallelism (SURVEY.md §2); these tests validate the
new TPU-native capability: a row-sharded solve must match the
single-device solve to tolerance, and vmapped λ/μ sweeps / problem fleets
must match per-instance scalar solves.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scso_tpu as scso
from scso_tpu.models import losses, synthetic
from scso_tpu.parallel import (
    make_mesh,
    pad_rows,
    shard_problem,
    solve_fleet,
    stack_problems,
    sweep,
)


def make_logreg(m=64, n=12, seed=0):
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        m, n, density=0.3, n_active=4, seed=seed, dtype=np.float64)
    return scso.Problem(
        A, y, x0, losses.logistic_f, 1e-2,
        grad_fx=losses.logistic_grad, hess_fx=losses.logistic_hess,
        dtype=np.float64,
    )


class TestMesh:
    def test_make_mesh_default(self):
        mesh = make_mesh()
        assert mesh.devices.size == len(jax.devices())
        assert mesh.axis_names == ("data",)

    def test_make_mesh_2d(self):
        mesh = make_mesh((4, 2), ("batch", "data"))
        assert mesh.shape["batch"] == 4
        assert mesh.shape["data"] == 2

    def test_make_mesh_too_big(self):
        with pytest.raises(ValueError):
            make_mesh((1000,))


class TestRowSharding:
    def test_sharded_solve_matches_single_device(self):
        prob = make_logreg(m=64)
        sm = scso.PHuberSmootherL1L2(1.0)
        ref = scso.iterate(scso.ProxNSCORE(), prob, "l1", sm, verbose=0)

        mesh = make_mesh()
        sprob = shard_problem(prob, mesh)
        # data is actually distributed by rows
        assert len(sprob.A.sharding.device_set) == 8
        sol = scso.iterate(scso.ProxNSCORE(), sprob, "l1", sm, verbose=0)
        np.testing.assert_allclose(sol.x, ref.x, atol=1e-9)
        np.testing.assert_allclose(sol.obj[-1], ref.obj[-1], rtol=1e-12)

    def test_sharded_cg_matches(self):
        prob = make_logreg(m=64)
        sm = scso.PHuberSmootherL1L2(1.0)
        method = scso.ProxNSCORE(solver="cg", cg_tol=1e-12)
        ref = scso.iterate(method, prob, "l1", sm, verbose=0)
        sprob = shard_problem(prob, make_mesh())
        sol = scso.iterate(method, sprob, "l1", sm, verbose=0)
        np.testing.assert_allclose(sol.x, ref.x, atol=1e-8)

    def test_indivisible_rejected(self):
        prob = make_logreg(m=30)
        with pytest.raises(ValueError):
            shard_problem(prob, make_mesh())

    def test_requires_data(self):
        prob = scso.Problem(np.zeros(2), losses.rosenbrock, 1e-8,
                            dtype=np.float64)
        with pytest.raises(ValueError):
            shard_problem(prob, make_mesh())

    def test_pad_rows(self):
        A = np.ones((5, 3))
        y = np.ones((5,))
        Ap, yp, m = pad_rows(A, y, 8)
        assert Ap.shape == (8, 3) and yp.shape == (8,) and m == 5
        assert np.all(np.asarray(Ap[5:]) == 0)
        A2, y2, m2 = pad_rows(np.asarray(Ap), np.asarray(yp), 8)
        assert m2 == 8 and A2.shape == (8, 3)


class TestSweep:
    def test_lambda_path_matches_scalar_solves(self):
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        lam_grid = np.array([1e-3, 1e-2, 1e-1, 1.0])
        opts = scso.Options(max_epoch=100, verbose=0)
        res = sweep(scso.ProxNSCORE(), prob, "l1", sm,
                    lam_grid=lam_grid, opts=opts)
        assert res.batch_size == 4
        from scso_tpu._src.struct import replace as dc_replace
        for i, lam in enumerate(lam_grid):
            p = dc_replace(prob, lam=jnp.asarray(lam, jnp.float64))
            ref = scso.iterate(scso.ProxNSCORE(), p, "l1", sm,
                               max_epoch=100, verbose=0)
            np.testing.assert_allclose(res.x[i], ref.x, atol=1e-9)
            np.testing.assert_allclose(res.obj[i], ref.obj[-1], rtol=1e-10)
            assert res.epochs[i] == ref.epochs

    def test_stats_every_amortized_sweep_matches(self):
        # the two-level stats loop (outer while over rounds, inner fori of
        # plain steps) must reach the same iterates as per-epoch stats —
        # and it is what keeps stats_every real under vmap, where a
        # batched-predicate lax.cond lowers to select (both branches run)
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        lam_grid = np.array([1e-3, 1e-2, 1e-1, 1.0])
        res1 = sweep(scso.ProxNSCORE(), prob, "l1", sm, lam_grid=lam_grid,
                     opts=scso.Options(max_epoch=100, verbose=0))
        res4 = sweep(scso.ProxNSCORE(), prob, "l1", sm, lam_grid=lam_grid,
                     opts=scso.Options(max_epoch=100, verbose=0,
                                       stats_every=4))
        # identical trajectory; stopping may lag < stats_every epochs
        # (f_tol sees the gap only at round starts)
        np.testing.assert_allclose(res4.x, res1.x, atol=1e-8)
        assert np.all(np.asarray(res4.epochs) >= np.asarray(res1.epochs))
        assert np.all(np.asarray(res4.epochs)
                      < np.asarray(res1.epochs) + 4)
        # histories recorded at round starts only
        assert np.all(np.asarray(res4.n_rec) <= np.asarray(res1.n_rec))

    def test_path_waves_matches_scalar_solves(self):
        """Pathwise warm-started sweep must land on the same optima as
        per-λ cold scalar solves (glmnet-style waves change the start
        point, not the fixed point)."""
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        lam_grid = np.logspace(-3, 0, 8)
        opts = scso.Options(max_epoch=300, verbose=0)
        res = sweep(scso.ProxNSCORE(), prob, "l1", sm,
                    lam_grid=lam_grid, opts=opts, path_waves=4)
        assert res.batch_size == 8
        from scso_tpu._src.struct import replace as dc_replace
        for i, lam in enumerate(lam_grid):
            p = dc_replace(prob, lam=jnp.asarray(lam, jnp.float64))
            ref = scso.iterate(scso.ProxNSCORE(), p, "l1", sm,
                               max_epoch=300, verbose=0)
            np.testing.assert_allclose(res.x[i], ref.x, atol=1e-7)
            np.testing.assert_allclose(res.obj[i], ref.obj[-1],
                                       rtol=1e-8, atol=1e-12)

    def test_plan_throughput_matches_cold(self):
        """plan='throughput' IS the cold one-dispatch sweep."""
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        lam_grid = np.logspace(-3, 0, 8)
        opts = scso.Options(max_epoch=100, verbose=0)
        cold = sweep(scso.ProxNSCORE(), prob, "l1", sm,
                     lam_grid=lam_grid, opts=opts)
        planned = sweep(scso.ProxNSCORE(), prob, "l1", sm,
                        lam_grid=lam_grid, opts=opts, plan="throughput")
        np.testing.assert_array_equal(planned.x, cold.x)
        np.testing.assert_array_equal(planned.epochs, cold.epochs)

    def test_plan_quality_matches_explicit_waves(self):
        """plan='quality' = waves with W = largest divisor of B in [2,16]
        and warm cap max_epoch/4."""
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        lam_grid = np.logspace(-3, 0, 8)
        opts = scso.Options(max_epoch=300, verbose=0)
        planned = sweep(scso.ProxNSCORE(), prob, "l1", sm,
                        lam_grid=lam_grid, opts=opts, plan="quality")
        explicit = sweep(scso.ProxNSCORE(), prob, "l1", sm,
                         lam_grid=lam_grid, opts=opts, path_waves=8,
                         wave_max_epoch=75)
        np.testing.assert_array_equal(planned.x, explicit.x)
        np.testing.assert_array_equal(planned.epochs, explicit.epochs)

    def test_plan_auto_picks_a_valid_plan(self):
        """plan='auto' resolves to throughput or quality (never crashes)
        and still lands on the cold sweep's optima."""
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        lam_grid = np.logspace(-3, 0, 8)
        opts = scso.Options(max_epoch=300, verbose=0)
        res = sweep(scso.ProxNSCORE(), prob, "l1", sm,
                    lam_grid=lam_grid, opts=opts, plan="auto")
        cold = sweep(scso.ProxNSCORE(), prob, "l1", sm,
                     lam_grid=lam_grid, opts=opts)
        np.testing.assert_allclose(res.x, cold.x, atol=1e-7)

    def test_plan_resolution_rule(self):
        """The auto rule follows the measured trade: huge per-wave
        compute → waves; tiny compute or high dispatch latency → cold."""
        from scso_tpu.parallel.sweep import _resolve_plan, \
            _largest_wave_count
        prob = make_logreg(m=32, n=8)
        opts = scso.Options(max_epoch=300, verbose=0)
        # tiny problem on CPU: one wave's estimated compute is far under
        # 4x even a ~50 us dispatch → throughput
        W, cap = _resolve_plan("auto", prob, 16, opts, 1)
        assert W == 0
        # quality always waves (with the divisibility constraints)
        W, cap = _resolve_plan("quality", prob, 16, opts, 1)
        assert W == 16 and cap == 75
        # mesh divisibility: per-wave batch must divide the axis
        assert _largest_wave_count(16, ndev=8) == 2  # Bw=8 divisible
        assert _largest_wave_count(7) == 7
        assert _largest_wave_count(13, cap=8) == 0  # prime > cap

    def test_plan_arg_validation(self):
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        lam_grid = np.logspace(-3, 0, 8)
        with pytest.raises(ValueError, match="choose"):
            sweep(scso.ProxNSCORE(), prob, "l1", sm, lam_grid=lam_grid,
                  plan="fastest")
        with pytest.raises(ValueError, match="not both"):
            sweep(scso.ProxNSCORE(), prob, "l1", sm, lam_grid=lam_grid,
                  plan="quality", path_waves=4)
        with pytest.raises(ValueError, match="chosen by the plan"):
            sweep(scso.ProxNSCORE(), prob, "l1", sm, lam_grid=lam_grid,
                  plan="quality", wave_max_epoch=5)

    def test_path_waves_warm_start_helps(self):
        """Later waves inherit nearby solutions: total epochs over the
        path must drop vs cold all-at-once."""
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        lam_grid = np.logspace(-3, 0, 16)
        opts = scso.Options(max_epoch=300, verbose=0)
        cold = sweep(scso.ProxNSCORE(), prob, "l1", sm,
                     lam_grid=lam_grid, opts=opts)
        warm = sweep(scso.ProxNSCORE(), prob, "l1", sm,
                     lam_grid=lam_grid, opts=opts, path_waves=8)
        assert (np.asarray(warm.epochs).sum()
                < np.asarray(cold.epochs).sum())

    def test_path_waves_group_lasso_two_lambda(self):
        """Multi-λ (gl) grids sort waves by total penalty; results come
        back in original grid order and match the cold sweep.

        Uses the smooth objective (use_prox=False, overdetermined m > n)
        so the minimizer is unique and start-point independent — with the
        gl prox step, warm vs cold starts may legitimately settle at
        different prox fixed points (a property of the damped scaled-prox
        iteration itself, shared with the reference algorithm), which
        would test the solver rather than the wave ordering/unscatter
        this test is about."""
        A, y, x_true, x0, groups = synthetic.make_group_lasso_problem(
            90, 30, 6, p_active=0.3, noise_std=0.05, seed=5,
            dtype=np.float64)
        prob = scso.Problem(
            A, y, x0, losses.lsq_f, [1e-8, 1.0],
            grad_fx=losses.lsq_grad, hess_fx=losses.lsq_hess,
            sol=x_true, groups=groups, dtype=np.float64)
        sm = scso.PHuberSmootherGL(1e-2, prob)
        lam2s = np.logspace(-2, 1, 8)
        lam_grid = np.stack([np.full_like(lam2s, 1e-8), lam2s], axis=1)
        opts = scso.Options(max_epoch=300, verbose=0)
        meth = scso.ProxNSCORE(use_prox=False)
        cold = sweep(meth, prob, "gl", sm, lam_grid=lam_grid, opts=opts)
        warm = sweep(meth, prob, "gl", sm, lam_grid=lam_grid, opts=opts,
                     path_waves=4)
        np.testing.assert_allclose(warm.x, cold.x, atol=1e-5)

    def test_path_waves_mu_homotopy(self):
        """μ-only waves run smoothest-first; final iterates match the
        cold sweep per μ (smooth objective — unique minimizer per μ, so
        the result cannot depend on which wave seeded the start point)."""
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        mu_grid = np.array([0.25, 0.5, 1.0, 2.0])
        opts = scso.Options(max_epoch=300, verbose=0)
        meth = scso.ProxNSCORE(use_prox=False)
        cold = sweep(meth, prob, "l1", sm, mu_grid=mu_grid, opts=opts)
        warm = sweep(meth, prob, "l1", sm, mu_grid=mu_grid, opts=opts,
                     path_waves=2)
        np.testing.assert_allclose(warm.x, cold.x, atol=1e-5)

    def test_wave_max_epoch_caps_warm_waves(self):
        """A tighter warm-wave cap keeps results at the easy path points
        and bounds the straggler tail; histories pad to the cold cap."""
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        mu_grid = np.array([0.25, 0.5, 1.0, 2.0])
        opts = scso.Options(max_epoch=300, verbose=0)
        meth = scso.ProxNSCORE(use_prox=False)
        full = sweep(meth, prob, "l1", sm, mu_grid=mu_grid, opts=opts,
                     path_waves=2)
        capped = sweep(meth, prob, "l1", sm, mu_grid=mu_grid, opts=opts,
                       path_waves=2, wave_max_epoch=100)
        # histories concatenate cleanly across the two program variants
        assert capped.obj_hist.shape == full.obj_hist.shape
        # warm waves are capped; wave 0 (cold) keeps the full budget
        assert np.asarray(capped.epochs).max() <= 300
        # Newton on the smooth objective converges well inside 100
        # epochs warm-started, so the capped path matches the full one
        np.testing.assert_allclose(capped.x, full.x, atol=1e-5)

    def test_x0_grid_polish_after_waves(self):
        """x0_grid composes the wave pattern by hand: one wide dispatch
        from the wave solutions reaches the same fixed points as the
        cold sweep (smooth objective — unique minimizer per instance),
        in few epochs."""
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        lam_grid = np.logspace(-3, -1, 8)
        opts = scso.Options(max_epoch=300, verbose=0)
        meth = scso.ProxNSCORE(use_prox=False)
        cold = sweep(meth, prob, "l1", sm, lam_grid=lam_grid, opts=opts)
        warm = sweep(meth, prob, "l1", sm, lam_grid=lam_grid, opts=opts,
                     path_waves=2, wave_max_epoch=30)
        polish = sweep(meth, prob, "l1", sm, lam_grid=lam_grid, opts=opts,
                       x0_grid=warm.x)
        np.testing.assert_allclose(polish.x, cold.x, atol=1e-5)
        # starting at/near the solution, the polish stops quickly
        assert (np.asarray(polish.epochs).sum()
                < np.asarray(cold.epochs).sum())

    def test_x0_grid_shape_validated(self):
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        with pytest.raises(ValueError, match="x0_grid shape"):
            sweep(scso.ProxLQNSCORE(), prob, "l1", sm,
                  lam_grid=np.logspace(-3, -1, 4),
                  x0_grid=np.zeros((4, 9)))
        with pytest.raises(ValueError, match="path_waves"):
            sweep(scso.ProxLQNSCORE(), prob, "l1", sm,
                  lam_grid=np.logspace(-3, -1, 4),
                  x0_grid=np.zeros((4, 8)), path_waves=2)

    def test_wave_max_epoch_requires_path_waves(self):
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        with pytest.raises(ValueError, match="path_waves"):
            sweep(scso.ProxLQNSCORE(), prob, "l1", sm,
                  lam_grid=np.logspace(-3, -1, 4), wave_max_epoch=50)

    def test_path_waves_indivisible_rejected(self):
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        with pytest.raises(ValueError, match="divide"):
            sweep(scso.ProxNSCORE(), prob, "l1", sm,
                  lam_grid=np.logspace(-3, 0, 6),
                  opts=scso.Options(max_epoch=50, verbose=0), path_waves=4)

    def test_mu_grid(self):
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        res = sweep(scso.ProxLQNSCORE(), prob, "l1", sm,
                    mu_grid=np.array([0.5, 1.0, 2.0]),
                    opts=scso.Options(max_epoch=200, verbose=0))
        assert res.batch_size == 3
        assert np.all(np.isfinite(res.obj))

    def test_sharded_batch_axis(self):
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        mesh = make_mesh(axis_names=("batch",))
        lam_grid = np.logspace(-3, 0, 8)
        res = sweep(scso.ProxNSCORE(), prob, "l1", sm, lam_grid=lam_grid,
                    opts=scso.Options(max_epoch=100, verbose=0), mesh=mesh)
        assert res.batch_size == 8
        assert np.all(np.isfinite(res.obj))
        # heavy penalties drive the solution fully sparse
        assert np.allclose(res.x[-1], 0.0, atol=1e-6)
        # light penalties keep signal
        assert np.linalg.norm(res.x[0]) > 0.1

    def test_grid_size_mismatch(self):
        prob = make_logreg(m=32, n=8)
        sm = scso.PHuberSmootherL1L2(1.0)
        with pytest.raises(ValueError):
            sweep(scso.ProxNSCORE(), prob, "l1", sm,
                  lam_grid=np.ones(3), mu_grid=np.ones(4))

    def test_no_grids(self):
        prob = make_logreg(m=32, n=8)
        with pytest.raises(ValueError):
            sweep(scso.ProxNSCORE(), prob, "l1",
                  scso.PHuberSmootherL1L2(1.0))


class TestFleet:
    def test_fleet_matches_scalar_solves(self):
        probs = [make_logreg(m=32, n=8, seed=s) for s in range(4)]
        sm = scso.PHuberSmootherL1L2(1.0)
        sms = stack_problems([sm] * 4)  # trivially stacked smoother leaves
        batched = stack_problems(probs)
        opts = scso.Options(max_epoch=100, verbose=0)
        res = solve_fleet(scso.ProxNSCORE(), batched, "l1", sms, opts=opts)
        assert res.batch_size == 4
        for i, p in enumerate(probs):
            ref = scso.iterate(scso.ProxNSCORE(), p, "l1", sm,
                               max_epoch=100, verbose=0)
            np.testing.assert_allclose(res.x[i], ref.x, atol=1e-9)
            assert res.epochs[i] == ref.epochs

    def test_fleet_sharded(self):
        probs = [make_logreg(m=32, n=8, seed=s) for s in range(8)]
        sm = scso.PHuberSmootherL1L2(1.0)
        mesh = make_mesh(axis_names=("batch",))
        res = solve_fleet(
            scso.ProxLQNSCORE(), stack_problems(probs), "l1",
            stack_problems([sm] * 8),
            opts=scso.Options(max_epoch=150, verbose=0), mesh=mesh)
        assert res.batch_size == 8
        assert np.all(np.isfinite(res.obj))


class TestFeatureSharding:
    def test_feature_sharded_solve_matches(self):
        from scso_tpu.parallel import shard_problem_features

        prob = make_logreg(m=64, n=16)
        sm = scso.PHuberSmootherL1L2(1.0)
        method = scso.ProxNSCORE(solver="cg", cg_tol=1e-12)
        ref = scso.iterate(method, prob, "l1", sm, verbose=0)

        mesh = make_mesh(axis_names=("model",))
        sprob = shard_problem_features(prob, mesh)
        assert len(sprob.A.sharding.device_set) == 8
        sol = scso.iterate(method, sprob, "l1", sm, verbose=0)
        np.testing.assert_allclose(sol.x, ref.x, atol=1e-8)

    def test_2d_data_model_mesh(self):
        from scso_tpu.parallel import shard_problem, shard_problem_features

        prob = make_logreg(m=64, n=16)
        sm = scso.PHuberSmootherL1L2(1.0)
        method = scso.ProxNSCORE(solver="cg", cg_tol=1e-12)
        ref = scso.iterate(method, prob, "l1", sm, verbose=0)

        mesh = make_mesh((4, 2), ("data", "model"))
        sprob = shard_problem_features(
            shard_problem(prob, mesh, data_axis="data"), mesh)
        import jax
        from jax.sharding import PartitionSpec as P
        assert sprob.A.sharding.spec == P("data", "model")
        sol = scso.iterate(method, sprob, "l1", sm, verbose=0)
        np.testing.assert_allclose(sol.x, ref.x, atol=1e-8)

    def test_indivisible_n(self):
        from scso_tpu.parallel import shard_problem_features
        prob = make_logreg(m=64, n=12)
        with pytest.raises(ValueError):
            shard_problem_features(prob, make_mesh(axis_names=("model",)))


class TestShardedGLMPath:
    def test_row_sharded_glm_cg_matches(self):
        """The GLM single-z path (explicit matvec + einsum Jacobi diag)
        must partition under GSPMD and match the single-device solve."""
        A, y, x0, _ = synthetic.make_sparse_logreg_data(
            64, 16, density=0.3, n_active=4, seed=3, dtype=np.float64,
            label01=True)
        prob = scso.Problem(
            A, y, x0, losses.logistic01_f, 1e-2,
            grad_fx=losses.logistic01_grad,
            out_fn=losses.sigmoid_out,
            grad_fy=losses.logistic_ggn_residual,
            hess_fy_diag=losses.logistic_ggn_qdiag,
            hvp_w=losses.logistic01_hvp_w, ggn_w=losses.logistic_ggn_w,
            glm=losses.LOGISTIC01_GLM, dtype=np.float64)
        sm = scso.PHuberSmootherL1L2(1.0)
        for method in [scso.ProxNSCORE(solver="cg", cg_tol=1e-12),
                       scso.ProxGGNSCORE(solver="cg", cg_tol=1e-12)]:
            ref = scso.iterate(method, prob, "l1", sm, max_epoch=60,
                               verbose=0)
            sol = scso.iterate(method, shard_problem(prob, make_mesh()),
                               "l1", sm, max_epoch=60, verbose=0)
            np.testing.assert_allclose(sol.x, ref.x, atol=1e-8)


class TestShardedFusedMatvec:
    def test_matches_unsharded(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from scso_tpu.ops.pallas.matvec import fused_normal_matvec_sharded

        rng = np.random.default_rng(0)
        m, n = 256, 128
        A = rng.standard_normal((m, n))
        w = rng.random(m)
        v = rng.standard_normal(n)
        mesh = make_mesh()
        Ad = jax.device_put(jnp.asarray(A), NamedSharding(mesh, P("data", None)))
        wd = jax.device_put(jnp.asarray(w), NamedSharding(mesh, P("data")))
        vd = jax.device_put(jnp.asarray(v), NamedSharding(mesh, P()))
        got = np.asarray(fused_normal_matvec_sharded(Ad, wd, vd, mesh))
        ref = A.T @ (w * (A @ v))
        np.testing.assert_allclose(got, ref, rtol=1e-12)

    def test_full_sharded_pallas_solve(self):
        """kernels='pallas' on a row-sharded problem routes CG matvecs
        through the shard_map'd fused kernel inside the while_loop and
        must match the XLA sharded solve."""
        A, y, x0, _ = synthetic.make_sparse_logreg_data(
            64, 128, density=0.3, n_active=8, seed=4, dtype=np.float64,
            label01=True)
        prob = scso.Problem(
            A, y, x0, losses.logistic01_f, 1e-2,
            grad_fx=losses.logistic01_grad,
            glm=losses.LOGISTIC01_GLM, dtype=np.float64)
        sm = scso.PHuberSmootherL1L2(1.0)
        sprob = shard_problem(prob, make_mesh())
        # greedy off: kernel-parity test (see test_pallas solver parity)
        ref = scso.iterate(
            scso.ProxGGNSCORE(solver="cg", kernels="xla",
                              greedy_alpha=False),
            sprob, "l1", sm, max_epoch=40, verbose=0)
        sol = scso.iterate(
            scso.ProxGGNSCORE(solver="cg", kernels="pallas",
                              greedy_alpha=False),
            sprob, "l1", sm, max_epoch=40, verbose=0)
        np.testing.assert_allclose(sol.x, ref.x, atol=1e-7)


class TestCommOverlap:
    def test_overlapped_sharded_matvec_matches_plain(self):
        from scso_tpu.ops.pallas.matvec import fused_normal_matvec_sharded
        from scso_tpu.parallel import make_mesh

        rng = np.random.default_rng(21)
        m, n = 512, 384
        A = jnp.asarray(rng.standard_normal((m, n)))
        w = jnp.asarray(rng.random(m))
        v = jnp.asarray(rng.standard_normal(n))
        mesh = make_mesh()
        ref = np.asarray(A.T @ (w * (A @ v)))
        plain = fused_normal_matvec_sharded(A, w, v, mesh)
        over = fused_normal_matvec_sharded(A, w, v, mesh,
                                           overlap_chunks=3)
        np.testing.assert_allclose(np.asarray(plain), ref, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(over), ref, rtol=1e-10)

    def test_overlapped_solve_matches_plain(self):
        """End-to-end row-sharded GGN-CG with comm_overlap_chunks=2 lands
        on the plain sharded path's solution (dryrun-compatible)."""
        from scso_tpu.parallel import make_mesh, shard_problem
        from scso_tpu.models import losses, synthetic

        A, y, x0, _ = synthetic.make_sparse_logreg_data(
            256, 128, density=0.1, n_active=8, seed=13, dtype=np.float64,
            label01=True)
        prob = scso.Problem(A, y, x0, losses.logistic01_f, 1e-2,
                            grad_fx=losses.logistic01_grad,
                            glm=losses.LOGISTIC01_GLM, dtype=np.float64)
        sprob = shard_problem(prob, make_mesh())
        sm = scso.PHuberSmootherL1L2(1.0)
        kw = dict(max_epoch=30, verbose=0)
        base = scso.iterate(
            scso.ProxGGNSCORE(solver="cg", kernels="pallas"),
            sprob, "l1", sm, **kw)
        over = scso.iterate(
            scso.ProxGGNSCORE(solver="cg", kernels="pallas",
                              comm_overlap_chunks=2),
            sprob, "l1", sm, **kw)
        np.testing.assert_allclose(over.x, base.x, atol=1e-9)
        assert over.epochs == base.epochs


class TestShardedPrecisionAdaptiveCG:
    """Round 5: precision-adaptive CG composes with row sharding —
    shard_problem shards A_lp alongside A and steps._lp_matvec routes
    the bulk-phase curvature matvecs through the sharded copy."""

    FLOOR = 3e-4  # steps._cg_tol f32 AUTO value

    def _prob(self):
        A, y, x0, _ = synthetic.make_sparse_logreg_data(
            64, 16, density=0.3, n_active=4, seed=5, dtype=np.float32,
            label01=True)
        return scso.Problem(
            A, y, x0, losses.logistic01_f, 1e-2,
            grad_fx=losses.logistic01_grad,
            out_fn=losses.sigmoid_out,
            grad_fy=losses.logistic_ggn_residual,
            hess_fy_diag=losses.logistic_ggn_qdiag,
            loss_fn=losses.logistic_loss_01,
            hvp_w=losses.logistic01_hvp_w, ggn_w=losses.logistic_ggn_w,
            glm=losses.LOGISTIC01_GLM, dtype=np.float32)

    def _solve(self, prob, method):
        return scso.iterate(method, prob, "l1",
                            scso.PHuberSmootherL1L2(1.0), max_epoch=60,
                            verbose=0)

    def test_shard_problem_shards_a_lp(self):
        prob = scso.with_lp_copy(self._prob())
        sprob = shard_problem(prob, make_mesh())
        assert sprob.A_lp is not None
        assert sprob.A_lp.sharding.spec[0] == "data"
        assert sprob.A_lp.dtype == jnp.bfloat16

    def test_sharded_same_dtype_copy_bitmatch(self):
        """A same-dtype copy is identical math whichever cond branch
        runs — the sharded lp solve must bit-match the sharded no-lp
        solve (engagement changes nothing but the operand identity)."""
        prob = self._prob()
        mesh = make_mesh()
        base = self._solve(shard_problem(prob, mesh),
                           scso.ProxGGNSCORE(solver="cg"))
        p_same = shard_problem(
            scso.with_lp_copy(prob, dtype=prob.A.dtype), mesh)
        s = self._solve(p_same, scso.ProxGGNSCORE(
            solver="cg", cg_lp_tol=self.FLOOR))
        np.testing.assert_array_equal(s.x, base.x)

    @pytest.mark.parametrize("cache", [None, False])
    def test_sharded_lp_branch_engages(self, cache):
        """Poisoned (zero) sharded copy + lp_tol == floor must change
        the trajectory vs the plain sharded solve — positive proof the
        cond picks the sharded copy in the bulk phase, cached and
        uncached."""
        from scso_tpu._src.struct import replace as dc_replace

        prob = self._prob()
        mesh = make_mesh()
        sprob = shard_problem(prob, mesh)
        base = self._solve(sprob, scso.ProxGGNSCORE(solver="cg",
                                                    epoch_cache=cache))
        p_poison = shard_problem(
            dc_replace(prob, A_lp=jnp.zeros_like(prob.A)), mesh)
        s = self._solve(p_poison, scso.ProxGGNSCORE(
            solver="cg", cg_lp_tol=self.FLOOR, epoch_cache=cache))
        assert not np.array_equal(s.x, base.x)

    def test_sharded_bf16_copy_reaches_same_optimum(self):
        prob = self._prob()
        mesh = make_mesh()
        base = self._solve(shard_problem(prob, mesh),
                           scso.ProxGGNSCORE(solver="cg"))
        p_lp = shard_problem(scso.with_lp_copy(prob), mesh)
        s = self._solve(p_lp, scso.ProxGGNSCORE(
            solver="cg", cg_lp_tol=self.FLOOR))
        np.testing.assert_allclose(s.obj[-1], base.obj[-1], rtol=2e-5)
        np.testing.assert_allclose(s.x, base.x, atol=2e-3)

    def test_auto_lp_resolver_attaches_sharded_copy(self):
        import dataclasses as dc

        from scso_tpu.algorithms.iterate import Options, _auto_lp

        sprob = shard_problem(self._prob(), make_mesh())
        m = scso.ProxGGNSCORE(solver="cg", auto_lp=True)
        m2, p2 = _auto_lp(m, sprob, Options())
        assert p2.A_lp is not None
        assert p2.A_lp.sharding.spec[0] == "data"
        assert m2.cg_lp_tol == pytest.approx(self.FLOOR)
