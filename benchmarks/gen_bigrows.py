"""Generate a ≥10⁷-row sparse logistic dataset straight to disk.

The north-star problem names m = 10⁷ rows (BASELINE.json:5); this writes
an (M, N) f32 sparse-design logistic regression in the
`save_problem_data` layout (A.npy / y.npy / manifest.json + x0.npy)
WITHOUT ever holding the matrix in RAM: rows are generated
chunk-by-chunk (per-chunk RNG streams seeded from (seed, chunk index)),
labels drawn from a Bernoulli at a fixed ground-truth x, and appended to
a pre-headered .npy. Host RSS stays at one chunk (~128 MB).

Run as a SUBPROCESS from bench.py so the bench process's own VmHWM
reflects the chunked disk→device load, not the generation:

    python benchmarks/gen_bigrows.py OUTDIR M N [SEED]

Chunked generation is NOT bit-compatible with
`synthetic.make_sparse_logreg_data` (whose single global RNG stream
would need the full matrix resident); the statistical family is the
same: density-0.05 N(0,1) entries, 64 active ground-truth features.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

DENSITY = 0.05
N_ACTIVE = 64
CHUNK_ROWS = 1 << 17  # ~64 MB per chunk at n=128 f32


def _write_header(fh, shape, dtype):
    np.lib.format.write_array_header_2_0(
        fh, dict(descr=np.lib.format.dtype_to_descr(np.dtype(dtype)),
                 fortran_order=False, shape=tuple(shape)))


def generate(outdir: str, m: int, n: int, seed: int = 7) -> None:
    os.makedirs(outdir, exist_ok=True)
    root = np.random.default_rng(seed)
    x_true = np.zeros((n,), np.float32)
    idx = root.choice(n, size=min(N_ACTIVE, n), replace=False)
    x_true[idx] = root.standard_normal(idx.size).astype(np.float32)
    x0 = root.standard_normal(n).astype(np.float32)

    a_path = os.path.join(outdir, "A.npy")
    y_path = os.path.join(outdir, "y.npy")
    with open(a_path, "wb") as fa, open(y_path, "wb") as fy:
        _write_header(fa, (m, n), np.float32)
        _write_header(fy, (m,), np.float32)
        for ci, lo in enumerate(range(0, m, CHUNK_ROWS)):
            hi = min(lo + CHUNK_ROWS, m)
            rows = hi - lo
            rng = np.random.default_rng((seed, ci))
            A = np.zeros((rows, n), np.float32)
            nnz = max(1, int(DENSITY * rows * n))
            r = rng.integers(0, rows, size=nnz)
            c = rng.integers(0, n, size=nnz)
            A[r, c] = rng.standard_normal(nnz).astype(np.float32)
            p = 1.0 / (1.0 + np.exp(-(A @ x_true)))
            y = (rng.random(rows) < p).astype(np.float32)  # 0/1 labels
            fa.write(A.tobytes())
            fy.write(y.tobytes())
    np.save(os.path.join(outdir, "x0.npy"), x0)
    np.save(os.path.join(outdir, "x_true.npy"), x_true)
    with open(os.path.join(outdir, "manifest.json"), "w") as fh:
        json.dump(dict(m=int(m), n=int(n), dtype="float32",
                       has_test=False, seed=int(seed),
                       density=DENSITY, n_active=N_ACTIVE), fh)


if __name__ == "__main__":
    outdir, m, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 7
    generate(outdir, m, n, seed)
    print(f"gen_bigrows: wrote {m}x{n} f32 to {outdir}")
