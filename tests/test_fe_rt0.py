"""H(div) lowest-order Raviart-Thomas mixed Poisson (the RT member of
the PetscSpace/PetscDualSpace family, src/dm/dt/dualspace): contravariant
Piola mapping, directed-edge flux dofs, signed-incidence div block.
Acceptance contract: elementwise conservation div sigma_h + f = 0 to
machine precision, centroid convergence of the P0 potential, and a
saddle-point solve through PCFieldSplit Schur."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

import petsc_tpu as pt
from petsc_tpu.dm.fe import build_edges, rt0_mixed_poisson
from petsc_tpu.dm.plex import DMPlex


def _solve_dense(n):
    plex = DMPlex.createBoxMesh((n, n), simplex=True)
    K, rhs, ne = rt0_mixed_poisson(plex, f=1.0)
    Ks = K.to_scipy().tocsc()
    s = spla.spsolve(Ks, np.asarray(rhs.getArray())[: Ks.shape[0]])
    return plex, s[:ne], s[ne:], ne


def _divergence(plex, sigma):
    cells = plex.cells
    edges, c2e = build_edges(cells)
    v = plex.coords[cells]
    J = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]], axis=2)
    detJ = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
    pairs = [(0, 1), (1, 2), (0, 2)]
    sgn = np.stack([np.where(cells[:, a] < cells[:, b], 1.0, -1.0)
                    for a, b in pairs], axis=1)
    o = np.array([1.0, 1.0, -1.0])
    div = (sgn * o[None, :] * np.sign(detJ)[:, None]
           * sigma[c2e]).sum(axis=1)
    return div, np.abs(detJ) / 2.0


def test_rt0_exact_elementwise_conservation():
    plex, sigma, u, ne = _solve_dense(10)
    div, area = _divergence(plex, sigma)
    assert np.abs(div + area).max() < 1e-12    # div sigma = -f exactly


def test_rt0_potential_converges():
    """P0 potential at centroids converges (superconvergent ~O(h^2))
    against the exact series solution of -lap u = 1, u=0 on the square."""

    def u_exact(xy):
        x, y = xy[:, 0], xy[:, 1]
        u = np.zeros_like(x)
        for k in range(1, 40, 2):
            for l in range(1, 40, 2):
                u += (16 / np.pi ** 4
                      * np.sin(k * np.pi * x) * np.sin(l * np.pi * y)
                      / (k * l * (k * k + l * l)))
        return u

    errs = []
    for n in (8, 16):
        plex, sigma, u, ne = _solve_dense(n)
        cent = plex.coords[plex.cells].mean(axis=1)
        _, area = _divergence(plex, sigma)
        errs.append(np.sqrt((area * (u - u_exact(cent)) ** 2).sum()))
    assert np.log2(errs[0] / errs[1]) > 1.4, errs


def test_rt0_fieldsplit_schur_solve():
    """The RT0 saddle system solves through the framework's own
    PCFieldSplit Schur (selfp) — H(div) plugged into the solver stack."""
    plex = DMPlex.createBoxMesh((8, 8), simplex=True)
    K, rhs, ne = rt0_mixed_poisson(plex, f=1.0)
    nc = K.getSize()[0] - ne
    pt.init(args=["-pc_type", "fieldsplit", "-pc_fieldsplit_type", "schur",
                  "-pc_fieldsplit_schur_precondition", "selfp",
                  "-ksp_type", "fgmres"])
    ksp = pt.KSP().create()
    ksp.setOperators(K)
    ksp.setTolerances(rtol=1e-10, max_it=400)
    ksp.setFromOptions()
    ksp.getPC()._impl.setIS("0", np.arange(ne))
    ksp.getPC()._impl.setIS("1", np.arange(ne, ne + nc))
    x = K.createVecRight()
    ksp.solve(rhs, x)
    assert ksp.getConvergedReason() > 0
    s = np.asarray(x.getArray())[: ne + nc]
    div, area = _divergence(plex, s[:ne])
    assert np.abs(div + area).max() < 1e-8


def test_cr_stokes_exactly_divergence_free():
    """CR/P0 Stokes: solve a body-force problem with no-slip boundary
    (velocity dofs on boundary edges pinned, one pressure pinned) and
    verify the hallmark: cellwise-exact discrete divergence freedom."""
    import scipy.sparse as sp
    from petsc_tpu.dm.fe import build_edges, cr_stokes_system
    plex = DMPlex.createBoxMesh((8, 8), simplex=True)
    K, rhs, nvel = cr_stokes_system(plex, f=(0.0, -1.0))
    Ks = K.to_scipy().tolil()
    n = Ks.shape[0]
    edges, c2e = build_edges(plex.cells)
    mid = 0.5 * (plex.coords[edges[:, 0]] + plex.coords[edges[:, 1]])
    bnd_e = np.nonzero((mid.min(axis=1) < 1e-9)
                       | (mid.max(axis=1) > 1 - 1e-9))[0]
    pinned = np.concatenate([bnd_e * 2, bnd_e * 2 + 1, [nvel]])
    b = np.asarray(rhs.getArray())[:n].copy()
    for r in pinned:
        Ks.rows[r] = [int(r)]
        Ks.data[r] = [1.0]
        b[r] = 0.0
    Ks = Ks.tocsr()
    coo = Ks.tocoo()
    keep = ~np.isin(coo.col, pinned) | (coo.row == coo.col)
    Ks = sp.csr_matrix((coo.data[keep], (coo.row[keep], coo.col[keep])),
                       shape=Ks.shape)
    s = spla.spsolve(Ks.tocsc(), b)
    u = s[:nvel]
    assert np.abs(u).max() > 1e-4        # flow actually happens
    # hallmark: exact cellwise divergence freedom
    from petsc_tpu.dm.plex import _p1_cell_gradients
    g, vol = _p1_cell_gradients(plex.coords, plex.cells, 2)
    gphi = -2.0 * g[:, [2, 0, 1], :]
    div = (vol[:, None] * (gphi[:, :, 0] * u[c2e * 2]
                           + gphi[:, :, 1] * u[c2e * 2 + 1])).sum(axis=1)
    assert np.abs(div).max() < 1e-12


def test_cr_stokes_fieldsplit_solve():
    """The (pinned) CR/P0 Stokes system solves through the framework's
    PCFieldSplit Schur rather than a direct factorization."""
    import scipy.sparse as sp
    from petsc_tpu.dm.fe import build_edges, cr_stokes_system
    plex = DMPlex.createBoxMesh((6, 6), simplex=True)
    K, rhs, nvel = cr_stokes_system(plex, f=(0.0, -1.0))
    Ks = K.to_scipy().tolil()
    n = Ks.shape[0]
    edges, c2e = build_edges(plex.cells)
    mid = 0.5 * (plex.coords[edges[:, 0]] + plex.coords[edges[:, 1]])
    bnd_e = np.nonzero((mid.min(axis=1) < 1e-9)
                       | (mid.max(axis=1) > 1 - 1e-9))[0]
    pinned = np.concatenate([bnd_e * 2, bnd_e * 2 + 1, [nvel]])
    b = np.asarray(rhs.getArray())[:n].copy()
    for r in pinned:
        Ks.rows[r] = [int(r)]
        Ks.data[r] = [1.0]
        b[r] = 0.0
    Ks = Ks.tocsr()
    coo = Ks.tocoo()
    keep = ~np.isin(coo.col, pinned) | (coo.row == coo.col)
    Ks = sp.csr_matrix((coo.data[keep], (coo.row[keep], coo.col[keep])),
                       shape=Ks.shape)
    pt.init(args=["-pc_type", "fieldsplit", "-pc_fieldsplit_type", "schur",
                  "-pc_fieldsplit_schur_precondition", "selfp",
                  "-ksp_type", "fgmres"])
    A = pt.MatAIJ.from_scipy(Ks)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setTolerances(rtol=1e-9, max_it=500)
    ksp.setFromOptions()
    ksp.getPC()._impl.setIS("0", np.arange(nvel))
    ksp.getPC()._impl.setIS("1", np.arange(nvel, n))
    bv = pt.Vec.from_array(b)
    x = A.createVecRight()
    ksp.solve(bv, x)
    assert ksp.getConvergedReason() > 0
    s = np.asarray(x.getArray())[:n]
    r = Ks @ s - b
    assert np.linalg.norm(r) < 1e-7
