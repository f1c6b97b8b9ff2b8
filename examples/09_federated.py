"""Federated sparse logistic regression: local SCORE + model averaging.

The reference parses-and-stores federated knobs without a mechanism
(`comm_rounds` is never read — iterate.jl:45,65,87; `local_max_iter`
only truncates batches). Here they drive a real machine: rows split
across clients, each round solves every client's local problem as ONE
vmapped program (shard the client axis over a mesh to scale out), then
averages. The per-round objective is the CENTRALIZED one, so the
averaging fixed-point gap is visible; the row-sharded solve finishes
from the federated iterate when the data can live on one mesh.
"""

import numpy as np

import scso_tpu as scso
from scso_tpu.models import losses, synthetic
from scso_tpu.parallel import federated_solve, make_mesh, shard_problem
from scso_tpu._src.struct import replace as dc_replace


def main():
    A, y, x0, _ = synthetic.make_sparse_logreg_data(
        1024, 32, density=0.2, n_active=8, seed=3, dtype=np.float64)
    prob = scso.Problem(A, y, x0, losses.logistic_f, 1e-2,
                        grad_fx=losses.logistic_grad,
                        hess_fx=losses.logistic_hess, dtype=np.float64)
    meth = scso.ProxNSCORE(solver="dense", ss_type=3)
    sm = scso.PHuberSmootherL1L2(1.0)

    central = scso.iterate(meth, prob, "l1", sm, max_epoch=200, verbose=0)
    print(f"centralized        obj = {central.obj[-1]:.8f}")

    fed = federated_solve(meth, prob, "l1", sm, n_clients=8,
                          comm_rounds=8, local_epochs=4, f_tol=1e-8)
    for r, o in enumerate(fed.obj, 1):
        print(f"round {r:2d}            obj = {o:.8f}")

    finish = scso.iterate(meth,
                          shard_problem(dc_replace(prob, x0=fed.x),
                                        make_mesh()),
                          "l1", sm, max_epoch=100, verbose=0)
    print(f"sharded finisher   obj = {finish.obj[-1]:.8f}")
    return finish


if __name__ == "__main__":
    main()
