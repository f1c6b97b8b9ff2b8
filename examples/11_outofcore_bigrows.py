"""Out-of-core rows at the north star's scale: disk → chunked device
loads → row-sharded solve.

The reference holds the data matrix in RAM and iterates over it
(`MLUtils.DataLoader`, utils/utils.jl:18-25). At 10⁷+ rows the matrix
should never be host-resident at once: this example synthesizes a
dataset straight to DISK (never materialized), streams it to the
device(s) shard-by-shard in bounded chunks
(`load_problem_rows_sharded(chunk_bytes=...)` — fresh `fromfile`
buffers + donated device updates, host RSS stays at one chunk), and
runs the standard GGN-CG solve on the row-sharded problem.

Run sizes: the default is laptop/CPU-friendly (65k×64, ~16 MB); pass
--rows 10002432 --n 128 on a TPU host to reproduce the
`northstar_rows_1e7` bench family (≥10⁷ true rows, 4.77 GiB, solved to
a 1e-6-class tolerance in seconds on one v5e — bench.py).
"""

import argparse
import os
import tempfile

import numpy as np


def main(argv=()):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 16)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--chunk-mib", type=int, default=64)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args(list(argv))

    import jax

    import scso_tpu as scso
    from scso_tpu.models import losses
    from scso_tpu.parallel import load_problem_rows_sharded, make_mesh

    workdir = args.workdir or tempfile.mkdtemp(prefix="scso_bigrows_")
    datadir = os.path.join(workdir, f"rows_{args.rows}x{args.n}")
    if not os.path.exists(os.path.join(datadir, "manifest.json")):
        # chunked straight-to-disk synthesis (host RSS: one chunk)
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, os.path.join(repo, "benchmarks"))
        from gen_bigrows import generate

        generate(datadir, args.rows, args.n, seed=7)
    x0 = np.load(os.path.join(datadir, "x0.npy"))

    # one mesh axis over all devices; each device receives only its own
    # row shard, assembled from <= chunk_mib disk reads
    mesh = make_mesh(axis_names=("data",))
    prob = load_problem_rows_sharded(
        datadir, x0, losses.logistic01_f, 0.01, mesh,
        chunk_bytes=args.chunk_mib << 20,
        grad_fx=losses.logistic01_grad, out_fn=losses.sigmoid_out,
        grad_fy=losses.logistic_ggn_residual,
        hess_fy_diag=losses.logistic_ggn_qdiag,
        loss_fn=losses.logistic_loss_01,
        hvp_w=losses.logistic01_hvp_w, ggn_w=losses.logistic_ggn_w,
        glm=losses.LOGISTIC01_GLM)
    jax.block_until_ready(prob.A)
    print(f"loaded {args.rows}x{args.n} "
          f"({args.rows * args.n * 4 / 2**30:.2f} GiB) over "
          f"{len(mesh.devices.ravel())} device(s)")

    sol = scso.iterate(
        scso.ProxGGNSCORE(solver="cg"), prob, "l1",
        scso.PHuberSmootherL1L2(1.0),
        max_epoch=60, x_tol=1e-8, verbose=0, alpha=1.0)
    x = np.asarray(sol.x)
    print(f"epochs={sol.epochs}  obj={float(sol.obj[-1]):.6f}  "
          f"nnz={(np.abs(x) > 1e-6).sum()}/{x.size}")
    return sol


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
