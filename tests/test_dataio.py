"""Sharded on-disk data IO (scso_tpu.parallel.dataio).

The north-star data matrix (400 GB) can never be resident on one host —
these tests pin the disk → sharded-device path: incremental .npy writes,
per-shard memmap reads via make_array_from_callback, and a full solve
from a loaded problem bit-matching the in-memory sharded solve.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scso_tpu as scso
from scso_tpu.models import losses, synthetic
from scso_tpu.parallel import (
    load_problem_rows_sharded,
    load_rows_sharded,
    make_mesh,
    save_array,
    save_problem_data,
    shard_problem,
)


def _data(m=64, n=16, dtype=np.float64):
    return synthetic.make_sparse_logreg_data(
        m, n, density=0.3, n_active=4, seed=0, dtype=dtype, label01=True)


class TestSaveArray:
    def test_roundtrip_chunked(self, tmp_path):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((37, 5)).astype(np.float32)
        p = str(tmp_path / "a.npy")
        save_array(p, A, chunk_rows=8)  # non-divisible chunking
        np.testing.assert_array_equal(np.load(p), A)

    def test_memmap_source_never_materialized(self, tmp_path):
        # a memmap source streams through chunk-sized buffers only
        src = str(tmp_path / "src.npy")
        A = np.arange(200, dtype=np.float32).reshape(50, 4)
        np.save(src, A)
        mm = np.load(src, mmap_mode="r")
        dst = str(tmp_path / "dst.npy")
        save_array(dst, mm, chunk_rows=7)
        np.testing.assert_array_equal(np.load(dst), A)

    def test_vector_roundtrip(self, tmp_path):
        y = np.random.default_rng(1).standard_normal(33)
        p = str(tmp_path / "y.npy")
        save_array(p, y, chunk_rows=10)
        np.testing.assert_array_equal(np.load(p), y)


class TestLoadRowsSharded:
    def test_sharded_load_matches_file(self, tmp_path):
        A, y, x0, _ = _data()
        p = str(tmp_path / "A.npy")
        save_array(p, np.asarray(A))
        mesh = make_mesh()
        arr = load_rows_sharded(p, mesh)
        assert arr.shape == A.shape
        assert len(arr.sharding.device_set) == len(jax.devices())
        np.testing.assert_array_equal(np.asarray(arr), np.asarray(A))

    def test_dtype_cast_on_load(self, tmp_path):
        A, *_ = _data(dtype=np.float64)
        p = str(tmp_path / "A.npy")
        save_array(p, np.asarray(A))
        arr = load_rows_sharded(p, make_mesh(), dtype=np.float32)
        assert arr.dtype == jnp.float32

    def test_indivisible_rows_refused(self, tmp_path):
        p = str(tmp_path / "A.npy")
        save_array(p, np.zeros((30, 4)))  # 30 % 8 != 0
        with pytest.raises(ValueError, match="not divisible"):
            load_rows_sharded(p, make_mesh())


class TestLoadProblem:
    def test_solve_from_disk_matches_in_memory_sharded(self, tmp_path):
        A, y, x0, _ = _data()
        kw = dict(grad_fx=losses.logistic01_grad,
                  glm=losses.LOGISTIC01_GLM)
        mem_prob = scso.Problem(A, y, x0, losses.logistic01_f, 1e-2,
                                dtype=np.float64, **kw)
        mesh = make_mesh()
        sharded = shard_problem(mem_prob, mesh)

        d = str(tmp_path / "prob")
        save_problem_data(d, np.asarray(A), np.asarray(y))
        loaded = load_problem_rows_sharded(
            d, x0, losses.logistic01_f, 1e-2, mesh, **kw)
        assert loaded.mesh is mesh and loaded.data_axis == "data"
        np.testing.assert_array_equal(np.asarray(loaded.A),
                                      np.asarray(sharded.A))

        sm = scso.PHuberSmootherL1L2(1.0)
        meth = scso.ProxGGNSCORE(solver="cg")
        s_mem = scso.iterate(meth, sharded, "l1", sm, max_epoch=30,
                             verbose=0)
        s_dsk = scso.iterate(meth, loaded, "l1", sm, max_epoch=30,
                             verbose=0)
        np.testing.assert_array_equal(np.asarray(s_dsk.x),
                                      np.asarray(s_mem.x))

    def test_test_split_roundtrip(self, tmp_path):
        A, y, x0, _ = _data(m=64)
        At, yt, _, _ = _data(m=32)
        d = str(tmp_path / "prob")
        save_problem_data(d, np.asarray(A), np.asarray(y),
                          Atest=np.asarray(At), ytest=np.asarray(yt))
        mesh = make_mesh()
        loaded = load_problem_rows_sharded(
            d, x0, losses.logistic01_f, 1e-2, mesh,
            grad_fx=losses.logistic01_grad, loss_fn=losses.logistic_loss_01)
        np.testing.assert_array_equal(np.asarray(loaded.Atest),
                                      np.asarray(At))
        sol = scso.iterate(scso.ProxNSCORE(), loaded, "l1",
                           scso.PHuberSmootherL1L2(1.0), max_epoch=10,
                           verbose=0)
        assert sol.fvaltest.shape[0] > 0  # test-split history recorded


class TestChunkedLoader:
    """chunk_bytes route: shards assembled on-device from ~chunk-sized
    fromfile reads (the bounded-host-RSS out-of-core path used by
    benchmarks/outofcore_tpu.py)."""

    def test_chunked_equals_default(self, tmp_path):
        A, y, x0, _ = _data(m=64, n=16)
        p = str(tmp_path / "A.npy")
        save_array(p, np.asarray(A))
        mesh = make_mesh()
        ref = load_rows_sharded(p, mesh)
        # chunk smaller than a shard AND non-divisor of the shard rows
        chunk = load_rows_sharded(p, mesh, chunk_bytes=3 * 16 * 8)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(chunk))
        assert chunk.sharding == ref.sharding

    def test_chunked_dtype_cast(self, tmp_path):
        A, y, x0, _ = _data(m=32, n=8)
        p = str(tmp_path / "A.npy")
        save_array(p, np.asarray(A))
        mesh = make_mesh()
        out = load_rows_sharded(p, mesh, dtype=np.float32,
                                chunk_bytes=1 << 10)
        assert out.dtype == np.float32
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(A, np.float32))

    def test_problem_load_chunked_solve_matches(self, tmp_path):
        from scso_tpu._src.struct import replace as dc_replace

        A, y, x0, _ = _data(m=64, n=16)
        d = str(tmp_path / "prob")
        save_problem_data(d, np.asarray(A), np.asarray(y))
        mesh = make_mesh()
        kw = dict(grad_fx=losses.logistic01_grad,
                  out_fn=losses.sigmoid_out,
                  grad_fy=losses.logistic_ggn_residual,
                  hess_fy_diag=losses.logistic_ggn_qdiag,
                  loss_fn=losses.logistic_loss_01,
                  hvp_w=losses.logistic01_hvp_w,
                  ggn_w=losses.logistic_ggn_w,
                  glm=losses.LOGISTIC01_GLM)
        p_def = load_problem_rows_sharded(
            d, np.asarray(x0), losses.logistic01_f, 0.05, mesh, **kw)
        p_chk = load_problem_rows_sharded(
            d, np.asarray(x0), losses.logistic01_f, 0.05, mesh,
            chunk_bytes=1 << 10, **kw)
        m = scso.ProxGGNSCORE(solver="cg", cg_tol=1e-10)
        sm = scso.PHuberSmootherL1L2(1.0)
        skw = dict(max_epoch=20, verbose=0, alpha=1.0)
        s1 = scso.iterate(m, p_def, "l1", sm, **skw)
        s2 = scso.iterate(m, p_chk, "l1", sm, **skw)
        np.testing.assert_array_equal(np.asarray(s1.x), np.asarray(s2.x))
