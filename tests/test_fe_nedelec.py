"""H(curl) lowest-order Nédélec (Whitney edge) elements: covariant
mapping, tangential-circulation dofs, discrete de Rham complex
(curl o grad = 0 exactly), constant-field mass patch test, and a
definite-Maxwell CG solve (src/dm/dt dualspace Nédélec role)."""

import numpy as np
import scipy.sparse as sp

import petsc_tpu as pt
from petsc_tpu.dm.fe import nedelec0_curlcurl
from petsc_tpu.dm.plex import DMPlex


def test_nedelec_discrete_de_rham():
    """curl(grad v) = 0: the curl-only operator annihilates the discrete
    gradient of ANY nodal field — exactly (spurious-mode freeness)."""
    plex = DMPlex.createBoxMesh((7, 9), simplex=True)
    K, G, edges = nedelec0_curlcurl(plex, alpha=1.0, beta=0.0)
    v = np.random.default_rng(0).random(plex.nvertices)
    Ev = G @ v
    KE = K.to_scipy() @ Ev
    assert np.abs(KE).max() < 1e-12 * max(np.abs(Ev).max(), 1.0)


def test_nedelec_constant_field_energy():
    """A uniform field E = c has edge dofs c.(x_hi - x_lo); its mass
    energy must equal |c|^2 * |domain| (Whitney forms reproduce
    constants)."""
    plex = DMPlex.createBoxMesh((6, 6), simplex=True)
    K, G, edges = nedelec0_curlcurl(plex, alpha=0.0, beta=1.0)
    c = np.array([0.3, -0.7])
    lo = edges.min(axis=1)
    hi = edges.max(axis=1)
    dofs = (plex.coords[hi] - plex.coords[lo]) @ c
    energy = float(dofs @ (K.to_scipy() @ dofs))
    assert abs(energy - (c @ c) * 1.0) < 1e-12


def test_nedelec_definite_maxwell_cg():
    """alpha curlcurl + beta mass is SPD: CG converges through the
    framework stack."""
    plex = DMPlex.createBoxMesh((10, 10), simplex=True)
    K, G, edges = nedelec0_curlcurl(plex, alpha=1.0, beta=1.0)
    pt.init(args=[])
    ksp = pt.KSP().create()
    ksp.setOperators(K)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-9, max_it=2000)
    b = K.createVecLeft()
    b.set(1.0)
    x = K.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason() > 0
    ne = K.getSize()[0]
    r = K.to_scipy() @ np.asarray(x.getArray())[:ne] - 1.0
    assert np.linalg.norm(r) / np.sqrt(ne) < 1e-7
