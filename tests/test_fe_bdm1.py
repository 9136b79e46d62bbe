"""H(div) BDM1 x P0 mixed Poisson (the higher-order PETSCDUALSPACEBDM
member, src/dm/dt/dualspace): batched physical-element Vandermonde
construction, two normal-flux moments per edge, signed-incidence div
block. Acceptance contract: elementwise conservation to machine
precision, flux L2 convergence at O(h^2) — one order above RT0 — and a
saddle solve through PCFieldSplit Schur."""

import numpy as np
import scipy.sparse.linalg as spla

import petsc_tpu as pt
from petsc_tpu.dm.fe import bdm1_mixed_poisson
from petsc_tpu.dm.plex import DMPlex

W = np.pi


def _uf():
    f = lambda x: 2 * W * W * np.sin(W * x[0]) * np.sin(W * x[1])
    gs = lambda xq: W * np.stack(
        [np.cos(W * xq[..., 0]) * np.sin(W * xq[..., 1]),
         np.sin(W * xq[..., 0]) * np.cos(W * xq[..., 1])], axis=-1)
    return f, gs


def _solve(n):
    f, gs = _uf()
    plex = DMPlex.createBoxMesh((n, n), simplex=True)
    K, rhs, ns, eval_sigma = bdm1_mixed_poisson(plex, f=f)
    Ks = K.to_scipy().tocsc()
    s = spla.spsolve(Ks, np.asarray(rhs.getArray())[: Ks.shape[0]])
    sig, xq, wdet = eval_sigma(s[:ns])
    err2 = float((wdet * ((sig - gs(xq)) ** 2).sum(axis=-1)).sum())
    return np.sqrt(err2), s, ns, plex, eval_sigma


def test_bdm1_flux_second_order():
    """sigma_h -> grad u at O(h^2) in L2 (vs RT0's O(h)) — the defining
    payoff of the higher-order space."""
    e1, *_ = _solve(8)
    e2, *_ = _solve(16)
    rate = np.log2(e1 / e2)
    assert rate > 1.7, (e1, e2, rate)


def test_bdm1_exact_elementwise_conservation():
    f, gs = _uf()
    plex = DMPlex.createBoxMesh((10, 10), simplex=True)
    K, rhs, ns, eval_sigma = bdm1_mixed_poisson(plex, f=f)
    Ks = K.to_scipy()
    s = spla.spsolve(Ks.tocsc(), np.asarray(rhs.getArray())[: Ks.shape[0]])
    # B sigma = -(f, 1)_cell exactly: read both sides off the system
    nc = Ks.shape[0] - ns
    B = Ks[ns:, :ns]
    rf = np.asarray(rhs.getArray())[ns: ns + nc]
    assert np.abs(B @ s[:ns] - rf).max() < 1e-11


def test_bdm1_fieldsplit_schur_solve():
    plex = DMPlex.createBoxMesh((8, 8), simplex=True)
    K, rhs, ns, _ = bdm1_mixed_poisson(plex, f=1.0)
    nall = K.getSize()[0]
    pt.init(args=["-pc_type", "fieldsplit", "-pc_fieldsplit_type", "schur",
                  "-pc_fieldsplit_schur_precondition", "selfp",
                  "-ksp_type", "fgmres"])
    ksp = pt.KSP().create()
    ksp.setOperators(K)
    ksp.setTolerances(rtol=1e-10, max_it=600)
    ksp.setFromOptions()
    ksp.getPC()._impl.setIS("0", np.arange(ns))
    ksp.getPC()._impl.setIS("1", np.arange(ns, nall))
    x = K.createVecRight()
    ksp.solve(rhs, x)
    assert ksp.getConvergedReason() > 0
    s = np.asarray(x.getArray())[:nall]
    r = K.to_scipy() @ s - np.asarray(rhs.getArray())[:nall]
    assert np.linalg.norm(r) < 1e-7
