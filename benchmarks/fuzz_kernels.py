"""Adversarial fuzz: every Pallas kernel vs its jnp reference at random
block-boundary shapes (interpret mode on CPU). Not part of the test
suite — a hunting tool (slow: one interpret-mode compile per unique
shape); a trimmed seeded subset lives in tests/test_pallas.py.

Run: JAX_PLATFORMS=cpu python benchmarks/fuzz_kernels.py
Round-2 result: 155 random shapes across the four kernels, zero
mismatches beyond f32 accumulation-order noise (glm_prep.b ~5e-6
relative on unnormalized sums).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# run from anywhere, like the other benchmark scripts
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scso_tpu.ops.pallas.matvec import fused_normal_matvec, supports_fused_normal_matvec
from scso_tpu.ops.pallas.score_update import fused_score_update
from scso_tpu.ops.pallas.two_loop import fused_two_loop
from scso_tpu.ops.pallas.glm_prep import fused_glm_prep
from scso_tpu.ops.pallas.matvec import (
    supports_fused_normal_matvec as supports_fused_glm_prep,
)
from scso_tpu.ops.lbfgs_core import init_memory, two_loop, update_memory

rng = np.random.default_rng(0)
FAILS = []


def check(name, a, b, rtol, atol=1e-6, ctx=""):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    ok = np.allclose(a, b, rtol=rtol, atol=atol)
    if not ok:
        mx = float(np.max(np.abs(a - b)))
        FAILS.append((name, ctx, mx))
        print(f"FAIL {name} {ctx}: max abs err {mx:.3e}")


def ref_score_update(x, d, lgr, hr, lam, ss, Mg, reg, lb=None, ub=None):
    hinv = 1.0 / hr
    terms = np.where(lgr == 0, 0.0, lgr * hinv * lgr)
    eta = np.sqrt(np.sum(terms, dtype=np.float64))
    alpha = ss / (1.0 + Mg * eta)
    safe = min(1.0, alpha)
    xs = x + np.float32(safe) * d
    if reg == "l1":
        t = ss * lam * hr
        xn = np.sign(xs) * np.maximum(np.abs(xs) - t, 0.0)
    elif reg == "l2":
        t = ss * lam * hr
        xs2 = xs * xs
        scale = np.where(xs2 == 0, 0.0, np.maximum(1.0 - t / np.where(xs2 == 0, 1.0, xs2), 0.0))
        xn = xs * scale
    elif reg == "indbox":
        xn = np.clip(xs, lb, ub)
    else:
        xn = xs
    return xn, np.linalg.norm(xn - x)


def fuzz_matvec(trials=40):
    for t in range(trials):
        n = 128 * int(rng.integers(1, 30))
        m = int(rng.integers(8, 5000))
        if not supports_fused_normal_matvec(m, n):
            continue
        A = rng.standard_normal((m, n)).astype(np.float32)
        w = rng.random(m).astype(np.float32)
        v = rng.standard_normal(n).astype(np.float32)
        got = fused_normal_matvec(jnp.asarray(A), jnp.asarray(w), jnp.asarray(v))
        want = A.T @ (w * (A @ v))
        scale = np.maximum(np.abs(want).max(), 1.0)
        check("matvec", got, want, rtol=2e-5, atol=3e-5 * scale, ctx=f"m={m} n={n}")


def fuzz_score_update(trials=60):
    for t in range(trials):
        n = int(rng.integers(1, 40000))
        reg = ["l1", "l2", "indbox", "none"][int(rng.integers(0, 4))]
        x = rng.standard_normal(n).astype(np.float32)
        d = rng.standard_normal(n).astype(np.float32)
        lgr = rng.standard_normal(n).astype(np.float32)
        # sprinkle exact zeros (the eta fix path) and tiny hr
        lgr[rng.random(n) < 0.1] = 0.0
        hr = (rng.random(n).astype(np.float32) + 1e-3)
        hr[rng.random(n) < 0.05] = 1e-7
        lam = float(rng.random() * 0.5 + 1e-3)
        ss = float(rng.random() * 0.9 + 0.1)
        Mg = float(rng.random() * 5)
        lb = np.full(n, -0.5, np.float32)
        ub = np.full(n, 0.7, np.float32)
        got_x, got_pri, got_safe = fused_score_update(
            jnp.asarray(x), jnp.asarray(d), jnp.asarray(lgr), jnp.asarray(hr),
            lam, ss, Mg, reg if reg != "none" else "l1",
            use_prox=(reg != "none"),
            lb=jnp.asarray(lb), ub=jnp.asarray(ub))
        want_x, want_pri = ref_score_update(x, d, lgr, hr, lam, ss, Mg, reg, lb, ub)
        check("score_update.x", got_x, want_x, rtol=1e-5, atol=1e-5,
              ctx=f"n={n} reg={reg}")
        check("score_update.pri", got_pri, want_pri, rtol=1e-4, atol=1e-5,
              ctx=f"n={n} reg={reg}")


def fuzz_two_loop(trials=30):
    for t in range(trials):
        n = int(rng.integers(1, 3000))
        mm = int(rng.integers(1, 12))
        mem = init_memory(n, mm, np.float32)
        k = int(rng.integers(0, 2 * mm + 1))
        # curvature pairs from an SPD quadratic: gamma = B·delta keeps the
        # two-loop well-conditioned (random pairs make rho explode and the
        # recursion legitimately diverges between any two f32 orderings)
        bdiag = (rng.random(n) * 4 + 0.5).astype(np.float32)
        for i in range(k):
            dlt = rng.standard_normal(n).astype(np.float32) * 0.1
            gma = (bdiag * dlt).astype(np.float32)
            mem = update_memory(mem, jnp.asarray(dlt), jnp.asarray(gma))
        g = rng.standard_normal(n).astype(np.float32)
        got = fused_two_loop(mem, jnp.asarray(g))
        want = two_loop(mem, jnp.asarray(g))
        check("two_loop", got, want, rtol=3e-5, atol=1e-5,
              ctx=f"n={n} m={mm} k={k}")


def fuzz_glm_prep(trials=25):
    for t in range(trials):
        n = 128 * int(rng.integers(1, 20))
        m = int(rng.integers(8, 4000))
        if not supports_fused_glm_prep(m, n):
            continue
        A = rng.standard_normal((m, n)).astype(np.float32)
        y = (rng.random(m) > 0.5).astype(np.float32)
        x = rng.standard_normal(n).astype(np.float32) * 0.1
        # NOT sample-normalized: the kernel calls these per tile, so any
        # 1/len(zb) normalization must be handled by the caller (the
        # GLMSpec.sample_normalized contract in steps.py)
        rw_fn = lambda yb, zb: (jax.nn.sigmoid(zb) - yb)
        w_fn = lambda yb, zb: jax.nn.sigmoid(zb) * (1 - jax.nn.sigmoid(zb))
        got_w, got_b, got_h = fused_glm_prep(
            jnp.asarray(A), jnp.asarray(y), jnp.asarray(x), rw_fn, w_fn)
        z = A @ x
        sig = 1 / (1 + np.exp(-z))
        want_w = (sig * (1 - sig)).astype(np.float64)
        want_b = A.T.astype(np.float64) @ (sig - y)
        want_h = np.einsum("i,ij,ij->j", want_w, A.astype(np.float64), A.astype(np.float64))
        # b entries are sums of m f32 products with |terms| ~ O(1): allow
        # sqrt(m)·eps accumulation-order noise on top of the relative tol
        acc = np.sqrt(m) * np.finfo(np.float32).eps * 10
        check("glm_prep.w", got_w, want_w, rtol=2e-5, atol=1e-6, ctx=f"m={m} n={n}")
        check("glm_prep.b", got_b, want_b, rtol=2e-5, atol=acc, ctx=f"m={m} n={n}")
        check("glm_prep.h", got_h, want_h, rtol=2e-5, atol=acc, ctx=f"m={m} n={n}")


if __name__ == "__main__":
    fuzz_matvec()
    print("matvec done")
    fuzz_score_update()
    print("score_update done")
    fuzz_two_loop()
    print("two_loop done")
    fuzz_glm_prep()
    print("glm_prep done")
    if FAILS:
        print(f"\n{len(FAILS)} FAILURES")
        for f in FAILS[:20]:
            print(" ", f)
    else:
        print("\nall fuzz checks passed")
