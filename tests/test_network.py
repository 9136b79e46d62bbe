"""DMNetwork tests: resistor-network KCL solve (reference model:
src/snes/tutorials/network/power.c style)."""

import numpy as np
import jax.numpy as jnp

import petsc_tpu as pt
from petsc_tpu.dm.network import DMNetwork


def build_resistor_net():
    """4-node ladder: v0 --1ohm-- v1 --1ohm-- v2 --1ohm-- v3, source at v0,
    ground at v3."""
    net = DMNetwork.create()
    net.addSubnetwork("ladder", [[0, 1], [1, 2], [2, 3]])
    net.layoutSetUp()
    key = net.registerComponent("bus")
    for v in range(4):
        net.addComponent(v, key, 1)
    net.setUp()
    return net


def test_layout_offsets():
    net = build_resistor_net()
    assert net.getNumVertices() == 4 and net.getNumEdges() == 3
    assert [net.getVariableOffset(v) for v in range(4)] == [0, 1, 2, 3]
    v = net.createGlobalVector()
    assert v.getSize() == 4


def test_kcl_solve_vectorized():
    """Assemble the graph Laplacian with the vectorized incidence helper,
    apply Dirichlet at the ends with zeroRowsColumns, and solve: interior
    voltages are the linear drop."""
    net = build_resistor_net()
    src, dst = net.incidence()
    n = 4
    import scipy.sparse as sp
    G = np.ones(len(src))                   # unit conductances
    L = sp.csr_matrix((np.concatenate([G, G, -G, -G]),
                       (np.concatenate([src, dst, src, dst]),
                        np.concatenate([src, dst, dst, src]))),
                      shape=(n, n))
    A = pt.MatAIJ.from_scipy(L)
    x = pt.Vec.from_array(np.array([1.0, 0.0, 0.0, 0.0]))
    b = pt.Vec.from_array(np.zeros(n))
    A.zeroRowsColumns([0, 3], diag=1.0, x=x, b=b)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-12)
    sol = A.createVecRight()
    ksp.solve(b, sol)
    v = np.asarray(sol.getArray())[:n]
    assert np.allclose(v, [1.0, 2.0 / 3.0, 1.0 / 3.0, 0.0], atol=1e-9)


def test_network_matrix_pattern():
    net = build_resistor_net()
    A = net.createMatrix()
    S = A.to_scipy()
    assert S.shape == (4, 4)
    assert S[0, 1] is not None and (S.indptr[1] - S.indptr[0]) == 2  # v0: self + v1
