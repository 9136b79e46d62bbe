"""BDIA-ELL layout (gather-free banded SpMV: block-diagonal buckets +
one-hot lane selects). The TPU answer to banded matrices with no
extractable diagonals — the pattern class where XLA's ~27 ns/element
gather floor makes CSR/ELL ports unusable (PERF.md round 3 probes)."""
import numpy as np
import pytest
import scipy.sparse as sp

import petsc_tpu as pt
from petsc_tpu.mat.aij import MatAIJ


def banded_random(n=6000, K=9, band=700, seed=0):
    """K random columns per row within a +-band window: no diagonal has
    enough occupancy for DIA/HYB, but the block-offset range is small."""
    r = np.arange(n, dtype=np.int64)
    rows, cols, vals = [], [], []
    for k in range(K):
        off = ((r * 1103515245 + 12345 + k * 40503) % (2 * band + 1)) - band
        c = np.clip(r + off, 0, n - 1) if k else r
        v = -(0.1 + ((r * (3 * k + 7)) % 89) / 89.0)
        if k == 0:
            v = 25.0 - v
        rows.append(r); cols.append(c); vals.append(v)
    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    A.sum_duplicates()
    return A


@pytest.fixture(scope="module")
def ctx():
    pt.init(args=[])
    yield


def test_auto_selects_bdia(ctx):
    A = banded_random()
    M = MatAIJ.from_scipy(A)
    assert M.meta[0] == "aij_bdia", M.meta[0]


def test_bdia_mult_matches_scipy(ctx):
    A = banded_random()
    M = MatAIJ.from_scipy(A)
    n = A.shape[0]
    x = np.cos(np.arange(n) * 0.37) + 0.1
    xv = pt.Vec.from_array(x)
    yv = M.createVecLeft()
    M.mult(xv, yv)
    np.testing.assert_allclose(np.asarray(yv.array)[:n], A @ x,
                               rtol=1e-12, atol=1e-10)


def test_bdia_mult_transpose(ctx):
    A = banded_random()
    M = MatAIJ.from_scipy(A)
    n = A.shape[0]
    x = np.sin(np.arange(n) * 0.11 + 0.3)
    xv = pt.Vec.from_array(x)
    yv = M.createVecRight()
    M.multTranspose(xv, yv)
    np.testing.assert_allclose(np.asarray(yv.array)[:n], A.T @ x,
                               rtol=1e-12, atol=1e-10)


def test_bdia_numeric_update(ctx):
    A = banded_random()
    M = MatAIJ.from_scipy(A)
    A2 = A.copy()
    A2.data = A2.data * 1.3 - 0.07
    M.setValuesCSR(A2.indptr, A2.indices, A2.data)
    M.assemble()
    n = A.shape[0]
    x = np.cos(np.arange(n) * 0.5)
    xv = pt.Vec.from_array(x)
    yv = M.createVecLeft()
    M.mult(xv, yv)
    np.testing.assert_allclose(np.asarray(yv.array)[:n], A2 @ x,
                               rtol=1e-12, atol=1e-10)


def test_bdia_solve(ctx):
    A = banded_random(n=5000, K=7, band=500)
    A = ((A + A.T) * 0.5 + sp.eye(A.shape[0]) * 30.0).tocsr()
    M = MatAIJ.from_scipy(A)
    assert M.meta[0] == "aij_bdia"
    n = A.shape[0]
    xs = np.linspace(-1, 1, n)
    b = pt.Vec.from_array(A @ xs)
    ksp = pt.KSP().create()
    ksp.setOperators(M)
    ksp.setType("gmres")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-12, max_it=500)
    x = M.createVecRight()
    ksp.solve(b, x)
    np.testing.assert_allclose(np.asarray(x.array)[:n], xs, atol=1e-7)


def test_bdia_float32(ctx):
    """Single-precision path (no bit-pair select)."""
    import jax.numpy as jnp
    from petsc_tpu.ops import spmv
    A = banded_random(n=4608, K=5, band=300)
    n = A.shape[0]
    M = MatAIJ.from_scipy(A)
    meta, data = M.meta, M.device_data()
    _, m, _, J, jmin, jmax, kcap, nspill = meta
    x = (np.cos(np.arange(n) * 0.2) + 1.2).astype(np.float32)
    spill = ((data["srows"], data["scols"],
              data["sdata"].astype(jnp.float32)) if nspill else None)
    y = spmv.bdia_spmv(data["joffs"], jmin, jmax,
                       data["data"].astype(jnp.float32), data["lanes"],
                       spill, jnp.asarray(x), m)
    np.testing.assert_allclose(np.asarray(y)[:n], (A @ x.astype(np.float64)),
                               rtol=2e-5, atol=2e-4)
