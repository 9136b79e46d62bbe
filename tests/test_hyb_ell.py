"""Hybrid ELL+spill layout for mpiaij (round-2 item: per-shard sizing).

One dense-ish row anywhere must not inflate every shard's ELL lanes to
the worst-case degree.  Reference keeps per-rank compressed CSR
(src/mat/impls/aij/mpi/mpiaij.h:40-74); the TPU analog caps the uniform
ELL width at the storage-optimal K and spills long-row tails to a small
padded COO segment (mat/aij.py:_hyb_width).
"""

import numpy as np
import pytest

import petsc_tpu as pt
from petsc_tpu.mat.aij import _hyb_width
from petsc_tpu.parallel.mesh import make_comm
from tests.test_mg_gamg import poisson3d


def _one_dense_row():
    """7-pt Poisson on 8^3 plus ONE row/col touching 200 columns."""
    import scipy.sparse as sp
    A = poisson3d(8).tolil()
    N = A.shape[0]
    rng = np.random.default_rng(7)
    cols = rng.choice(N, 200, replace=False)
    for j in cols:
        A[5, j] = 0.01
        A[j, 5] = 0.01
    return A.tocsr()


def test_hyb_width_prefers_spill():
    # 100 rows of degree 7, one of degree 200: K stays near 7
    deg = np.full(100, 7); deg[3] = 200
    K, S = _hyb_width([deg], 100)
    assert K <= 8 and S >= 192


def test_hyb_width_no_outlier_degenerates():
    deg = np.full(64, 7)
    K, S = _hyb_width([deg], 64)
    assert K == 7 and S == 0


@pytest.mark.parametrize("nsh", [4, 8])
def test_mpiaij_skewed_mult_and_transpose(nsh):
    A_sp = _one_dense_row()
    An = pt.MatAIJ.from_scipy(A_sp, comm=make_comm(nsh))
    assert An.meta[0] == "mpiaij"
    Kd, Ko = An.meta[4], An.meta[5]
    Sd, So = An.meta[10], An.meta[11]
    worst = int(np.diff(A_sp.indptr).max())
    # lanes capped well below the dense row's degree, tail in spill
    assert max(Kd, Ko) < worst // 2
    assert Sd + So > 0
    rng = np.random.default_rng(0)
    x = rng.random(A_sp.shape[0])
    vx = An.createVecLeft(); vx.setArray(x)
    y = An.createVecRight()
    An.mult(vx, y)
    np.testing.assert_allclose(y.getArray()[: A_sp.shape[0]], A_sp @ x,
                               rtol=1e-12, atol=1e-12)
    yt = An.createVecRight()
    An.multTranspose(vx, yt)
    np.testing.assert_allclose(yt.getArray()[: A_sp.shape[0]], A_sp.T @ x,
                               rtol=1e-12, atol=1e-12)


def test_mpiaij_near_uniform_correct():
    """Near-uniform degrees: mult stays exact whatever K/spill split the
    cost model picks (zero-spill degeneracy is unit-tested above)."""
    import scipy.sparse as sp
    A = poisson3d(8).tolil()
    rng = np.random.default_rng(3)
    for _ in range(40):  # off-band entries so mpiaij (not dia/dnd) binds
        i, j = rng.integers(0, A.shape[0], 2)
        A[i, j] = rng.random() - 0.5
    A_sp = A.tocsr()
    An = pt.MatAIJ.from_scipy(A_sp, comm=make_comm(4))
    assert An.meta[0] == "mpiaij"
    x = np.random.default_rng(1).random(A_sp.shape[0])
    vx = An.createVecLeft(); vx.setArray(x)
    y = An.createVecRight()
    An.mult(vx, y)
    np.testing.assert_allclose(y.getArray()[: A_sp.shape[0]], A_sp @ x,
                               rtol=1e-12, atol=1e-12)
