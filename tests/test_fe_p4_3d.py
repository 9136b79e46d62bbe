"""3-D simplex Lagrange P4+ (round 5): face-interior dofs numbered in
the face's canonical sorted-global-vertex frame so neighboring tets
agree — the oriented-face-dof deferral of rounds 1-4 closed for the
simplex family (plexfem.c closure-permutation role).
"""
import numpy as np
import scipy.sparse.linalg as spla
import pytest

import petsc_tpu as pt
from petsc_tpu.dm.fe import DS, lagrange_fe
from petsc_tpu.dm.plex import DMPlex


@pytest.mark.parametrize("k", [4, 5])
def test_p4plus_3d_conforming_patch(k):
    fe = lagrange_fe(3, k)
    mesh = DMPlex.createBoxMesh((2, 2, 2), simplex=True)
    ds = DS(mesh, fe)
    # conforming dof count on a box mesh: (2k+1)^3
    assert ds.ndof == (2 * k + 1) ** 3
    # nodal interpolation of x^k reproduces exactly
    u = ds.dof_coords[:, 0] ** k
    assert ds.l2_error(u, lambda x: x[0] ** k) < 1e-11
    # harmonic-polynomial patch: u = x^2 + 2y^2 - 3z^2 (lap u = 0);
    # interior residual vanishes ONLY if shared face dofs are truly
    # shared (a mismatch breaks conformity and leaves O(1) residual)
    ds.setResidual(f1=lambda u_, gu, x: gu)
    S = ds.assembleJacobian(np.zeros(ds.ndof)).tocsr()
    bnd = ds.boundary_dofs(lambda x: x.min() < 1e-9 or x.max() > 1 - 1e-9)
    keep = np.ones(ds.ndof, bool)
    keep[bnd] = False
    X = ds.dof_coords
    uex = X[:, 0] ** 2 + 2 * X[:, 1] ** 2 - 3 * X[:, 2] ** 2
    assert np.abs((S @ uex)[keep]).max() < 1e-10
    u2 = uex.copy()
    u2[keep] = spla.spsolve(S[keep][:, keep].tocsc(),
                            -(S[keep][:, ~keep] @ uex[~keep]))
    assert np.abs(u2 - uex).max() < 1e-9


@pytest.mark.parametrize("k", [3, 4])
def test_q3plus_hex_conforming_patch(k):
    """Q3+ hexes (round 5): quad-face interior dofs numbered in the
    face's canonical lowest-global-corner frame; neighbors agree.
    Tolerances scale with the monomial-Vandermonde conditioning."""
    fe = lagrange_fe(3, k, cell="tensor")
    mesh = DMPlex.createBoxMesh((2, 2, 2), simplex=False)
    ds = DS(mesh, fe)
    assert ds.ndof == (2 * k + 1) ** 3
    u = ds.dof_coords[:, 0] ** k
    assert ds.l2_error(u, lambda x: x[0] ** k) < 1e-9
    ds.setResidual(f1=lambda u_, gu, x: gu)
    S = ds.assembleJacobian(np.zeros(ds.ndof)).tocsr()
    bnd = ds.boundary_dofs(lambda x: x.min() < 1e-9 or x.max() > 1 - 1e-9)
    keep = np.ones(ds.ndof, bool)
    keep[bnd] = False
    X = ds.dof_coords
    uex = X[:, 0] ** 2 + 2 * X[:, 1] ** 2 - 3 * X[:, 2] ** 2
    assert np.abs((S @ uex)[keep]).max() < 1e-8
    u2 = uex.copy()
    u2[keep] = spla.spsolve(S[keep][:, keep].tocsc(),
                            -(S[keep][:, ~keep] @ uex[~keep]))
    assert np.abs(u2 - uex).max() < 1e-7
