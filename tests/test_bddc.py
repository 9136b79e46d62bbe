"""PCBDDC on a MATIS Q1 Poisson problem (bddc/ reference behavior)."""

import numpy as np
import pytest

import petsc_tpu as pt
from petsc_tpu.mat.utility import MatIS

# Q1 bilinear element Laplacian stiffness (unit square element), nodes
# ordered (SW, SE, NW, NE)
KE = np.array([
    [ 4.0, -1.0, -1.0, -2.0],
    [-1.0,  4.0, -2.0, -1.0],
    [-1.0, -2.0,  4.0, -1.0],
    [-2.0, -1.0, -1.0,  4.0],
]) / 6.0


def build_matis_poisson(ne=8, nsub=2):
    """ne x ne Q1 elements on the unit square, Dirichlet boundary
    eliminated, partitioned into nsub x nsub subdomains with LOCAL
    Neumann matrices (true unassembled MATIS input)."""
    nn = ne + 1
    def nid(i, j):
        return j * nn + i
    interior = {}
    for j in range(1, ne):
        for i in range(1, ne):
            interior[nid(i, j)] = len(interior)
    nglob = len(interior)
    epersub = ne // nsub
    mats, maps = [], []
    for sy in range(nsub):
        for sx in range(nsub):
            Kloc = {}
            order = []
            for ej in range(sy * epersub, (sy + 1) * epersub):
                for ei in range(sx * epersub, (sx + 1) * epersub):
                    nodes = [nid(ei, ej), nid(ei + 1, ej),
                             nid(ei, ej + 1), nid(ei + 1, ej + 1)]
                    for a in range(4):
                        if nodes[a] not in interior:
                            continue
                        if nodes[a] not in Kloc:
                            Kloc[nodes[a]] = len(order)
                            order.append(nodes[a])
            k = len(order)
            A = np.zeros((k, k))
            for ej in range(sy * epersub, (sy + 1) * epersub):
                for ei in range(sx * epersub, (sx + 1) * epersub):
                    nodes = [nid(ei, ej), nid(ei + 1, ej),
                             nid(ei, ej + 1), nid(ei + 1, ej + 1)]
                    for a in range(4):
                        for b in range(4):
                            na, nb = nodes[a], nodes[b]
                            if na in Kloc and nb in Kloc:
                                A[Kloc[na], Kloc[nb]] += KE[a, b]
            g = np.asarray([interior[n] for n in order], dtype=np.int64)
            mats.append(A)
            maps.append(g)
    return MatIS.create(nglob, mats, maps), nglob


@pytest.mark.parametrize("nsub", [2, 4])
def test_bddc_poisson(nsub):
    M, n = build_matis_poisson(ne=8 * nsub // 2, nsub=nsub)
    ksp = pt.KSP().create()
    ksp.setOperators(M)
    ksp.setType("cg")
    ksp.getPC().setType("bddc")
    ksp.setTolerances(rtol=1e-10)
    b = pt.Vec.from_array(np.ones(n))
    x = pt.Vec.from_array(np.zeros(n))
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged, ksp.getConvergedReason()
    S = M.assemble_global().to_scipy()
    r = S @ np.asarray(x.getArray())[:n] - 1.0
    assert np.linalg.norm(r) < 1e-7 * np.sqrt(n)
    # two-level scalability: iteration count stays modest
    assert ksp.getIterationNumber() < 40, ksp.getIterationNumber()


def test_bddc_beats_no_pc():
    M, n = build_matis_poisson(ne=12, nsub=2)

    def solve(pc_type):
        ksp = pt.KSP().create()
        ksp.setOperators(M)
        ksp.setType("cg")
        ksp.getPC().setType(pc_type)
        ksp.setTolerances(rtol=1e-8, max_it=2000)
        b = pt.Vec.from_array(np.ones(n))
        x = pt.Vec.from_array(np.zeros(n))
        ksp.solve(b, x)
        assert ksp.getConvergedReason().converged
        return ksp.getIterationNumber()

    assert solve("bddc") < 0.5 * solve("none")


@pytest.mark.parametrize("nsub", [2, 4])
def test_fetidp_matches_assembled_solve(nsub):
    """KSPFETIDP on the MATIS Poisson: the recovered primal solution
    matches the assembled direct solve; dual CG iteration count stays
    modest (two-level scalability via the primal coarse problem)."""
    M, n = build_matis_poisson(ne=8 * nsub // 2, nsub=nsub)
    ksp = pt.KSP().create()
    ksp.setOperators(M)
    ksp.setType("fetidp")
    ksp.setTolerances(rtol=1e-10)
    b = pt.Vec.from_array(np.ones(n))
    x = pt.Vec.from_array(np.zeros(n))
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged, ksp.getConvergedReason()
    S = M.assemble_global().to_scipy()
    import scipy.sparse.linalg as spla
    xref = spla.spsolve(S.tocsc(), np.ones(n))
    assert np.allclose(np.asarray(x.getArray())[:n], xref, atol=1e-6)
    assert ksp.getIterationNumber() < 60, ksp.getIterationNumber()
