"""Diagnose outer-iteration scaling of GGN-CG with n (VERDICT r2 Weak #2).

Replays the bench solve one epoch at a time in a host loop, recording the
quantities the fused driver hides: SCORE damping alpha = ss/(1+Mg*eta),
eta, CG iterations, step norm, and the relative objective gap. Goal: find
why the north-star shape (n = 10^4) needs ~6x the epochs of n = 1024.

Usage:
  JAX_PLATFORMS=cpu python benchmarks/diag_epochs.py --m 16384 --n 1024
  JAX_PLATFORMS=cpu python benchmarks/diag_epochs.py --m 16384 --n 10000 --pad
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

import scso_tpu as scso
from scso_tpu.algorithms.steps import ggn_step, _lam_scalar
from scso_tpu.ops.lbfgs_core import init_memory
from scso_tpu.ops.smoothers import get_Mg
from scso_tpu.models import losses, synthetic
from scso_tpu._src.struct import replace as dc_replace


def build(m, n, pad, mu, lam, seed=7):
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        m, n, density=0.05, n_active=64, seed=seed, dtype=np.float32,
        label01=True)
    prob = scso.Problem(
        A, y, x0, losses.logistic01_f, lam,
        grad_fx=losses.logistic01_grad,
        out_fn=losses.sigmoid_out,
        grad_fy=losses.logistic_ggn_residual,
        hess_fy_diag=losses.logistic_ggn_qdiag,
        loss_fn=losses.logistic_loss_01,
        hvp_w=losses.logistic01_hvp_w,
        ggn_w=losses.logistic_ggn_w,
        glm=losses.LOGISTIC01_GLM,
        dtype=np.float32,
        pad_features=pad,
    )
    return prob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=16384)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--pad", action="store_true")
    ap.add_argument("--mu", type=float, default=1.0)
    ap.add_argument("--lam", type=float, default=0.01)
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--cg-tol", type=float, default=3e-4)
    ap.add_argument("--adaptive", action="store_true")
    ap.add_argument("--greedy", action="store_true")
    ap.add_argument("--presolve-epochs", type=int, default=600)
    ap.add_argument("--max-epoch", type=int, default=400)
    ap.add_argument("--every", type=int, default=1,
                    help="print every K epochs")
    args = ap.parse_args()

    prob = build(args.m, args.n, args.pad, args.mu, args.lam)
    prob = dc_replace(prob, L=1.0 / args.alpha)
    method = scso.ProxGGNSCORE(solver="cg", cg_tol=args.cg_tol,
                               cg_maxiter=100, cg_adaptive=args.adaptive,
                               greedy_alpha=args.greedy)
    sm = scso.PHuberSmootherL1L2(args.mu)
    lam = float(_lam_scalar(prob.lam))
    n_eff = prob.n_true or prob.x0.shape[-1]
    Mg = get_Mg(sm.Mh, sm.nu, sm.mu, n_eff)

    # presolve to the optimum with the library driver
    s = scso.iterate(method, prob, "l1", sm, x_tol=1e-12, f_tol=0.0,
                     max_epoch=args.presolve_epochs, verbose=0,
                     stats_every=4, alpha=args.alpha)
    x_opt = s.state.x
    s = scso.iterate(method, dc_replace(prob, x0=x_opt), "l1", sm,
                     x_tol=1e-12, f_tol=0.0, max_epoch=args.presolve_epochs,
                     verbose=0, stats_every=4, alpha=args.alpha)
    x_opt = s.state.x
    obj = lambda x: float(prob.f_val(prob.A, prob.y, x)
                          + prob.reg("l1", x))
    obj_star = obj(x_opt)
    print(f"# presolve: {s.epochs} epochs, obj*={obj_star:.8f}", flush=True)

    @jax.jit
    def step(p, x, x_prev, d_prev, bnorm_prev, it):
        out = ggn_step(method, p, "l1", sm, p.A, p.y, x, x_prev,
                       jnp.zeros_like(x), it,
                       init_memory(x.shape[-1], 1, np.float32),
                       d_prev=d_prev, bnorm_prev=bnorm_prev)
        return out

    x = jnp.asarray(prob.x0)
    x_prev = x
    d_prev = jnp.zeros_like(x)
    bn = jnp.asarray(np.nan, jnp.float32)
    print("# epoch gap alpha eta ss cg_iters dnorm dxnorm nnz", flush=True)
    for it in range(1, args.max_epoch + 1):
        out = step(prob, x, x_prev, d_prev, bn, jnp.int32(it))
        dxn = float(jnp.linalg.norm(out.dx))
        dn = float(jnp.linalg.norm(out.d))
        safe_alpha = dxn / dn if dn > 0 else float("nan")
        # eta back-solved from alpha = ss/(1+Mg*eta) with ss = min(1/L,1)
        ss = min(1.0 / float(prob.L), 1.0) if prob.L else 0.5
        eta = (ss / safe_alpha - 1.0) / Mg if safe_alpha > 0 else float("nan")
        gap = (obj(out.x_new) - obj_star) / max(abs(obj_star), 1e-30)
        nnz = int(jnp.sum(jnp.abs(out.x_new) > 1e-8))
        if it % args.every == 0 or gap <= 1e-6:
            print(json.dumps({
                "epoch": it, "gap": round(gap, 10),
                "alpha": round(safe_alpha, 6), "eta": round(eta, 6),
                "ss": ss, "cg_iters": int(out.cg_iters),
                "dnorm": round(dn, 6), "dxnorm": round(dxn, 6),
                "nnz": nnz,
            }), flush=True)
        x_prev, x = x, out.x_new
        d_prev = out.d
        bn = out.bnorm
        if gap <= 1e-6:
            print(f"# reached 1e-6 gap at epoch {it}", flush=True)
            break


if __name__ == "__main__":
    main()
