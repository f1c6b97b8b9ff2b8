"""Prox-operator and group-structure tests (vs naive numpy references)."""

import numpy as np
import jax.numpy as jnp
import pytest

import scso_tpu as scso
from scso_tpu.ops import groups as G
from scso_tpu.ops import prox as P


def naive_group_norms(x, seg, ng):
    return np.array([np.linalg.norm(x[seg == g]) for g in range(ng)])


class TestGroups:
    def setup_method(self):
        self.seg = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 3])
        self.w = np.array([1.0, 2.0, 0.5, 3.0])
        self.g = G.make_groups(self.seg, self.w)
        rng = np.random.default_rng(0)
        self.x = rng.standard_normal(10)

    def test_norms(self):
        np.testing.assert_allclose(
            np.asarray(G.group_norms(self.g, jnp.asarray(self.x))),
            naive_group_norms(self.x, self.seg, 4),
            rtol=1e-12,
        )

    def test_lasso_fz(self):
        # parity: fz (prox-reg-utils.jl:101-110)
        expect = np.sum(self.w * naive_group_norms(self.x, self.seg, 4))
        got = float(G.lasso_fz(self.g, jnp.asarray(self.x)))
        assert got == pytest.approx(expect, rel=1e-12)

    def test_prox_l2_scaled_naive(self):
        # parity: ProxL2 (prox-reg-utils.jl:84-99)
        lam = 0.7
        h = np.abs(np.random.default_rng(1).standard_normal(10)) + 0.1
        got = np.asarray(
            G.prox_l2_scaled(self.g, jnp.asarray(self.x), lam, jnp.asarray(h))
        )
        expect = np.zeros(10)
        for g in range(4):
            idx = self.seg == g
            nrm = np.linalg.norm(self.x[idx])
            beta = lam * self.w[g]
            expect[idx] = self.x[idx] * np.maximum(1 - beta / (h[idx] * nrm), 0)
        np.testing.assert_allclose(got, expect, rtol=1e-12)

    def test_proj_l2_scaled_naive(self):
        # parity: ProjL2 (prox-reg-utils.jl:64-82)
        lam = 0.3
        h = np.abs(np.random.default_rng(2).standard_normal(10)) + 0.1
        got = np.asarray(
            G.proj_l2_scaled(self.g, jnp.asarray(self.x), lam, jnp.asarray(h))
        )
        expect = np.zeros(10)
        for g in range(4):
            idx = self.seg == g
            nrm = np.linalg.norm(self.x[idx] / h[idx])
            beta = lam * self.w[g]
            expect[idx] = self.x[idx] * np.minimum(beta / (h[idx] * nrm), 1)
        np.testing.assert_allclose(got, expect, rtol=1e-12)

    def test_make_groups_from_ind(self):
        # the reference 1-based inclusive (start, end, weight) convention
        ind = np.array([[1, 4, 8], [3, 7, 10], [1, 2, 1]])
        g = G.make_groups_from_ind(10, ind)
        np.testing.assert_array_equal(
            np.asarray(g.segment_ids), [0, 0, 0, 1, 1, 1, 1, 2, 2, 2]
        )
        np.testing.assert_allclose(np.asarray(g.weights), [1.0, 2.0, 1.0])


class TestProx:
    def test_l1_soft_threshold(self):
        x = jnp.asarray([3.0, -0.2, 0.0, -5.0])
        h = jnp.asarray([1.0, 1.0, 1.0, 1.0])
        out = np.asarray(P.prox_l1(x, h, 0.5, 1.0))  # t = 0.5
        np.testing.assert_allclose(out, [2.5, 0.0, 0.0, -4.5])

    def test_l1_metric_scaling(self):
        # t = alpha*lam/h: larger h => smaller threshold
        x = jnp.asarray([1.0, 1.0])
        h = jnp.asarray([10.0, 0.5])
        out = np.asarray(P.prox_l1(x, h, 1.0, 1.0))
        np.testing.assert_allclose(out, [1.0 - 0.1, 0.0])

    def test_l2_reference_form(self):
        # parity: x*max(1 - t/x^2, 0) (prox-operators.jl:24)
        x = jnp.asarray([2.0, 0.1, 0.0])
        h = jnp.asarray([1.0, 1.0, 1.0])
        out = np.asarray(P.prox_l2(x, h, 1.0, 1.0))
        np.testing.assert_allclose(out, [2.0 * (1 - 1 / 4), 0.0, 0.0])

    def test_indbox(self):
        x = jnp.asarray([-5.0, 0.3, 7.0])
        out = np.asarray(P.prox_indbox(x, -1.0, 1.0))
        np.testing.assert_allclose(out, [-1.0, 0.3, 1.0])

    def test_indbox_inf_bounds(self):
        x = jnp.asarray([-5.0, 7.0])
        out = np.asarray(P.prox_indbox(x, -jnp.inf, jnp.inf))
        np.testing.assert_allclose(out, [-5.0, 7.0])

    def test_group_lasso_naive(self):
        # parity: scaled_proximal_grouplasso (prox-operators.jl:48-66)
        seg = np.array([0, 0, 1, 1, 1])
        w = np.array([1.0, 2.0])
        g = G.make_groups(seg, w)
        rng = np.random.default_rng(3)
        x = rng.standard_normal(5)
        h = np.abs(rng.standard_normal(5)) + 0.5
        lam = jnp.asarray([0.3, 0.6])
        alpha = 0.8
        got = np.asarray(
            P.prox_group_lasso(jnp.asarray(x), jnp.asarray(h), lam, alpha, g)
        )
        # naive: soft-threshold with t = lam1/h (no alpha), then group ProxL2
        t = 0.3 / h
        u = np.sign(x) * np.maximum(np.abs(x) - t, 0)
        expect = np.zeros(5)
        for gi in range(2):
            idx = seg == gi
            nrm = np.linalg.norm(u[idx])
            beta = alpha * 0.6 * w[gi]
            if nrm > 0:
                expect[idx] = u[idx] * np.maximum(1 - beta / (h[idx] * nrm), 0)
        np.testing.assert_allclose(got, expect, rtol=1e-12)

    def test_dispatch_errors(self):
        x = jnp.zeros(3)
        with pytest.raises(ValueError):
            P.prox_step("bogus", x, x, 1.0, 1.0)
        with pytest.raises(ValueError):
            P.prox_step("indbox", x, x, 1.0, 1.0)


class TestRegValues:
    def test_l1_l2(self):
        x = jnp.asarray([1.0, -2.0, 3.0])
        assert float(scso.reg_value("l1", x, lam=0.5)) == pytest.approx(3.0)
        assert float(scso.reg_value("l2", x, lam=0.5)) == pytest.approx(7.0)

    def test_indbox(self):
        x = jnp.asarray([0.5, -0.5])
        v_in = float(scso.reg_value("indbox", x, lam=1.0, lb=-1.0, ub=1.0))
        v_out = float(
            scso.reg_value("indbox", jnp.asarray([2.0, 0.0]), lam=1.0,
                           lb=-1.0, ub=1.0)
        )
        assert v_in == 0.0
        assert v_out == np.inf

    def test_gl(self):
        seg = np.array([0, 0, 1])
        g = G.make_groups(seg, np.array([1.0, 2.0]))
        x = jnp.asarray([3.0, 4.0, -2.0])
        lam = jnp.asarray([0.1, 0.5])
        got = float(scso.reg_value("gl", x, lam=lam, groups=g))
        expect = 0.5 * (1.0 * 5.0 + 2.0 * 2.0) + 0.1 * 9.0
        assert got == pytest.approx(expect, rel=1e-12)

    def test_gl_requires_two_lams(self):
        seg = np.array([0, 0, 1])
        g = G.make_groups(seg)
        with pytest.raises(ValueError):
            scso.reg_value("gl", jnp.zeros(3), lam=1.0, groups=g)
