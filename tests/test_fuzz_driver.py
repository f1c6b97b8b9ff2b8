"""Seeded driver-level fuzz: random problem/method/option combinations.

The per-kernel fuzz lives in benchmarks/fuzz_kernels.py and
tests/test_pallas.py; this sweeps the SOLVER surface — random shapes,
methods, regularizers, smoothers, step-size schemes, batching and
stats amortization — asserting the invariants that hold for EVERY
configuration:

  * the solve completes with consistent history bookkeeping;
  * box-constrained prox solves land inside the box;
  * interrupt + resume bit-matches the uninterrupted run (the
    checkpoint contract holds even for diverging runs — determinism);
  * a non-finite iterate only ever arises from genuine divergence
    (objective exploding beyond 1e50), never from a numerics bug at
    moderate scale;
  * Armijo (ss_type=3) full-batch solves are monotone and finite.

Divergence itself is reference-parity, not a bug: the reference's
default step size without L (ss=0.5, prox-N-SCORE.jl:73-76) is a
heuristic with no global-convergence guarantee, and random separable
logistic instances (n comparable to m) can blow up under it — our dense
and CG paths reproduce the same divergent trajectory digit-for-digit.
Armijo (ss_type=3) is the guarded scheme.

Deterministic: a fixed master seed generates the whole case list, so a
failure reproduces by index.
"""

import numpy as np
import pytest

import scso_tpu as scso
from scso_tpu.models import losses, synthetic

MASTER_SEED = 20260818
N_CASES = 12


def _gen_cases():
    rng = np.random.default_rng(MASTER_SEED)
    cases = []
    for i in range(N_CASES):
        m = 4 * int(rng.integers(12, 64))  # multiple of 4: bs=m//4 divides
        n = int(rng.integers(8, 80))
        kind = rng.choice(["l1", "l2", "gl", "indbox"])
        method_kind = rng.choice(["newton", "newton_cg", "lbfgs"])
        ss_type = int(rng.choice([1, 2, 3]))
        batch = bool(rng.random() < 0.3)
        stats_every = int(rng.choice([1, 3]))
        cases.append(dict(i=i, m=m, n=n, kind=str(kind),
                          method_kind=str(method_kind), ss_type=ss_type,
                          batch=batch, stats_every=stats_every,
                          seed=int(rng.integers(0, 2**31))))
    return cases


CASES = _gen_cases()


def _build(case):
    m, n, seed = case["m"], case["n"], case["seed"]
    kind = case["kind"]
    kw = dict(dtype=np.float64)
    if kind == "gl":
        # group lasso needs group structure; round n to a group multiple
        gsz = max(2, n // 6)
        n = (n // gsz) * gsz or gsz
        kw["groups"] = scso.make_contiguous_groups(n, gsz)
        lam = [1e-2, 1e-2]  # (l1, gl) pair
    elif kind == "indbox":
        kw["C_set"] = [-0.7, 0.9]
        lam = 1.0
    else:
        lam = 1e-2
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        m, n, density=0.2, n_active=max(2, n // 6), seed=seed,
        dtype=np.float64)
    prob = scso.Problem(A, y, x0, losses.logistic_f, lam,
                        grad_fx=losses.logistic_grad,
                        hess_fx=losses.logistic_hess, **kw)
    return prob, n


def _smoother(case, prob):
    kind = case["kind"]
    if kind in ("l1", "l2"):
        return scso.PHuberSmootherL1L2(1.0)
    if kind == "gl":
        return scso.PHuberSmootherGL(1.0, prob)
    return scso.PHuberSmootherIndBox(-0.7, 0.9, 0.5)


def _method(case):
    mk, ss = case["method_kind"], case["ss_type"]
    if mk == "newton":
        return scso.ProxNSCORE(ss_type=ss, solver="dense")
    if mk == "newton_cg":
        return scso.ProxNSCORE(ss_type=ss, solver="cg")
    return scso.ProxLQNSCORE(ss_type=ss, m=5)


def _solve_kwargs(case, prob, max_epoch):
    kw = dict(max_epoch=max_epoch, verbose=0,
              stats_every=case["stats_every"])
    if case["batch"]:
        kw.update(batch_size=prob.A.shape[0] // 4, rng_seed=7)
    return kw


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"case{c['i']}")
def test_random_config_invariants(case):
    prob, n = _build(case)
    sm = _smoother(case, prob)
    meth = _method(case)
    kw = _solve_kwargs(case, prob, max_epoch=25)
    sol = scso.iterate(meth, prob, case["kind"], sm, **kw)

    # bookkeeping holds for every configuration
    assert 0 < len(sol.obj) <= kw["max_epoch"] + 1
    assert 0 <= sol.epochs <= kw["max_epoch"]
    assert len(sol.obj) == len(sol.fval) == len(sol.rel)
    assert sol.x.shape == (n,)

    # a non-finite iterate must be explained by genuine divergence —
    # the recorded objective exploding — never appear out of nowhere
    if not np.all(np.isfinite(sol.x)):
        finite_obj = sol.obj[np.isfinite(sol.obj)]
        assert finite_obj.size and np.max(finite_obj) > 1e50, case
    else:
        # box feasibility after a prox solve (x0 may start outside;
        # every prox step clamps)
        if case["kind"] == "indbox":
            assert np.all(sol.x >= -0.7 - 1e-9)
            assert np.all(sol.x <= 0.9 + 1e-9)

    # Armijo full-batch: guarded decrease of the true composite
    # (obj[0] may be +inf for an infeasible indbox start)
    if case["ss_type"] == 3 and not case["batch"]:
        assert np.all(np.isfinite(sol.x)), case
        assert sol.obj[-1] <= sol.obj[0] + 1e-9, case


def _gen_ggn_cases():
    rng = np.random.default_rng(MASTER_SEED + 1)
    cases = []
    for i in range(8):
        cases.append(dict(
            i=i,
            m=4 * int(rng.integers(16, 80)),
            n=int(rng.integers(8, 64)),
            family=str(rng.choice(["logistic01", "poisson"])),
            ss_type=int(rng.choice([1, 2, 3])),
            batch=bool(rng.random() < 0.25),
            stats_every=int(rng.choice([1, 4])),
            adaptive=bool(rng.random() < 0.5),
            seed=int(rng.integers(0, 2**31)),
        ))
    return cases


GGN_CASES = _gen_ggn_cases()


def _build_glm(case):
    m, n, seed = case["m"], case["n"], case["seed"]
    if case["family"] == "poisson":
        A, y, x0, _ = synthetic.make_sparse_poisson_data(
            m, n, density=0.2, n_active=max(2, n // 6), seed=seed,
            dtype=np.float64)
        return scso.Problem(A, y, x0, losses.poisson_f, 1e-2,
                            grad_fx=losses.poisson_grad,
                            out_fn=losses.exp_out,
                            loss_fn=losses.poisson_loss,
                            glm=losses.POISSON_GLM, dtype=np.float64)
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        m, n, density=0.2, n_active=max(2, n // 6), seed=seed,
        dtype=np.float64, label01=True)
    return scso.Problem(A, y, x0, losses.logistic01_f, 1e-2,
                        grad_fx=losses.logistic01_grad,
                        out_fn=losses.sigmoid_out,
                        loss_fn=losses.logistic_loss_01,
                        glm=losses.LOGISTIC01_GLM, dtype=np.float64)


@pytest.mark.parametrize("case", GGN_CASES, ids=lambda c: f"ggn{c['i']}")
def test_ggn_glm_random_config_invariants(case):
    """The GGN-CG GLM fast path (the headline TPU path) under random
    families/configs — same universal invariants."""
    prob = _build_glm(case)
    sm = scso.PHuberSmootherL1L2(1.0)
    meth = scso.ProxGGNSCORE(solver="cg", ss_type=case["ss_type"],
                             cg_adaptive=case["adaptive"])
    kw = dict(max_epoch=25, verbose=0, stats_every=case["stats_every"])
    if case["batch"]:
        kw.update(batch_size=prob.A.shape[0] // 4, rng_seed=3)
    sol = scso.iterate(meth, prob, "l1", sm, **kw)
    assert 0 < len(sol.obj) <= kw["max_epoch"] + 1
    assert len(sol.obj) == len(sol.fval) == len(sol.rel)
    if not np.all(np.isfinite(sol.x)):
        finite_obj = sol.obj[np.isfinite(sol.obj)]
        assert finite_obj.size and np.max(finite_obj) > 1e50, case
    elif case["ss_type"] == 3 and not case["batch"]:
        assert sol.obj[-1] <= sol.obj[0] + 1e-9, case


@pytest.mark.parametrize("case", [c for c in CASES if c["i"] % 3 == 0],
                         ids=lambda c: f"case{c['i']}")
def test_random_config_resume_bitmatch(case):
    """Interrupt + resume must bit-match straight-through for every
    random configuration — including diverging ones (determinism)."""
    prob, _ = _build(case)
    sm = _smoother(case, prob)
    meth = _method(case)
    kw = _solve_kwargs(case, prob, max_epoch=24)
    full = scso.iterate(meth, prob, case["kind"], sm, **kw)
    kw_part = dict(kw, max_epoch=11)
    part = scso.iterate(meth, prob, case["kind"], sm, **kw_part)
    resumed = scso.iterate(meth, prob, case["kind"], sm,
                           resume_state=part.state, **kw)
    nn = np.nan_to_num
    np.testing.assert_array_equal(nn(resumed.x), nn(full.x))
    assert resumed.epochs == full.epochs
    np.testing.assert_array_equal(nn(resumed.obj), nn(full.obj))
