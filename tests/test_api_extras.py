"""MatMAIJ / MatPreallocator / PF / orderings / fp_trap / pipelined
aliases coverage."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

import petsc_tpu as pt
from petsc_tpu.mat.utility import MatMAIJ, MatPreallocator
from petsc_tpu.mat.order import get_ordering, bandwidth
from petsc_tpu.ops import operator
from petsc_tpu.sys.pf import PF
from tests.test_mg_gamg import poisson2d


def test_mat_maij():
    A0 = sp.random(6, 5, density=0.5, random_state=0, format="csr")
    A = pt.MatAIJ.from_scipy(A0)
    M = MatMAIJ.create(A, 3)
    assert M.getSize() == (18, 15)
    op = operator.bind(M.meta, M.device_data())
    x = np.random.default_rng(1).random(15)
    y = np.asarray(op.mult(jnp.asarray(x)))
    ref = sp.kron(A0, sp.eye(3)) @ x        # interlaced = A ⊗ I_d
    assert np.allclose(y[:18], ref, atol=1e-12)


def test_mat_preallocator():
    P = MatPreallocator.create(5)
    P.setValues([0, 1], [0, 1])
    P.setValues([4], [3, 4])
    B = pt.MatAIJ(None)
    B.setSizes((5, 5))
    P.preallocate(B)
    S = B.to_scipy()
    assert S.nnz == 6 and S[4, 3] == 0.0


def test_pf_types():
    v = pt.Vec.from_array(np.array([1.0, 2.0, 3.0]))
    assert np.allclose(PF.create().setType("identity").apply(v)[:3],
                       [1, 2, 3])
    assert np.allclose(PF.create().setType("constant", 7.0).apply(v)[:3],
                       7.0)
    assert np.allclose(PF.create().setType("string", "x*x + 1").apply(v)[:3],
                       [2, 5, 10])
    pf = PF.create().setApply(lambda x: jnp.sin(x))
    assert np.allclose(pf.apply(v)[:3], np.sin([1, 2, 3]))


@pytest.mark.parametrize("kind", ["spectral", "amd", "1wd"])
def test_orderings(kind):
    A = pt.MatAIJ.from_scipy(poisson2d(8))
    r, c = get_ordering(A, kind)
    n = 64
    assert sorted(r.tolist()) == list(range(n))
    if kind == "spectral":
        # spectral ordering reduces bandwidth vs a random permutation
        assert bandwidth(A) <= 8 + 1


@pytest.mark.parametrize("kt", ["pgmres", "pipecg2", "pipeprcg"])
def test_pipelined_aliases(kt):
    A_sp = poisson2d(10)
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType(kt)
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-8)
    b = pt.Vec.from_array(np.ones(A_sp.shape[0]))
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged


def test_fp_trap_option():
    import jax
    pt.init(args=["-fp_trap"])
    assert jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", False)
    pt.init(args=[])
