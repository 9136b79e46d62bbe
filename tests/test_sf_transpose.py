"""Distributed transpose paths + SF completeness (round-2 items).

Reference roles: MatMultTranspose_MPIAIJ (src/mat/impls/aij/mpi/mpiaij.c,
reverse VecScatter path), PetscSFReduce over the allgatherv-pattern impl,
PetscSFGather / PetscSFFetchAndOp / PetscSFCompose
(src/vec/is/sf/interface/sf.c:1481 ff.), MatSolveTranspose_SeqAIJ
(src/mat/impls/aij/seq/aijfact.c).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import petsc_tpu as pt
from petsc_tpu.parallel.layout import Layout
from petsc_tpu.parallel.mesh import make_comm
from petsc_tpu.parallel.sf import ExchangePlan
from tests.test_mg_gamg import poisson3d


def _skewed_matrix():
    """Poisson + off-band entries so the mpiaij (not dia/dnd) path binds."""
    import scipy.sparse as sp
    A = poisson3d(8).tolil()
    rng = np.random.default_rng(3)
    for _ in range(40):
        i, j = rng.integers(0, A.shape[0], 2)
        A[i, j] = rng.random() - 0.5
    return A.tocsr()


@pytest.mark.parametrize("nsh", [2, 4, 8])
def test_mpiaij_mult_transpose(nsh):
    A_sp = _skewed_matrix()
    An = pt.MatAIJ.from_scipy(A_sp, comm=make_comm(nsh))
    assert An.meta[0] == "mpiaij"
    x = np.random.default_rng(0).random(A_sp.shape[0])
    vx = An.createVecLeft(); vx.setArray(x)
    y = An.createVecRight()
    An.multTranspose(vx, y)
    ref = A_sp.T @ x
    assert np.allclose(np.asarray(y.getArray())[: len(ref)], ref)


def test_dnd_mpi_mult_transpose():
    A_sp = poisson3d(16)
    An = pt.MatAIJ.from_scipy(A_sp, comm=make_comm(8))
    An.setStencilGrid((16, 16, 16))
    assert An.meta[0] == "dnd_mpi"
    x = np.random.default_rng(1).random(A_sp.shape[0])
    vx = An.createVecLeft(); vx.setArray(x)
    y = An.createVecRight()
    An.multTranspose(vx, y)
    assert np.allclose(np.asarray(y.getArray())[: A_sp.shape[0]],
                       A_sp.T @ x)


def test_distributed_lsqr():
    """Distributed LSQR: needs mult AND mult_t on the sharded operator."""
    A_sp = _skewed_matrix()
    A_sp = A_sp + 8.0 * __import__("scipy.sparse", fromlist=["eye"]).eye(
        A_sp.shape[0], format="csr")
    An = pt.MatAIJ.from_scipy(A_sp, comm=make_comm(8))
    assert An.meta[0] == "mpiaij"
    ksp = pt.KSP().create()
    ksp.setOperators(An)
    ksp.setType("lsqr")
    ksp.getPC().setType("none")
    ksp.setTolerances(rtol=1e-10, max_it=800)
    u = An.createVecRight(); u.set(1.0)
    b = An.createVecLeft(); An.mult(u, b)
    x = An.createVecRight()
    ksp.solve(b, x)
    x.axpy(-1.0, u)
    assert float(x.norm()) < 1e-5


def test_distributed_cgne():
    A_sp = _skewed_matrix()
    import scipy.sparse as sp
    A_sp = A_sp + 8.0 * sp.eye(A_sp.shape[0], format="csr")
    An = pt.MatAIJ.from_scipy(A_sp, comm=make_comm(4))
    ksp = pt.KSP().create()
    ksp.setOperators(An)
    ksp.setType("cgne")
    ksp.getPC().setType("none")
    ksp.setTolerances(rtol=1e-10, max_it=800)
    u = An.createVecRight(); u.set(1.0)
    b = An.createVecLeft(); An.mult(u, b)
    x = An.createVecRight()
    ksp.solve(b, x)
    x.axpy(-1.0, u)
    assert float(x.norm()) < 1e-4


def test_sf_reduce_allgather_plan():
    """reduce_add over the allgather-pattern plan (dense neighbor sets)."""
    nsh = 8
    comm = make_comm(nsh)
    blk = 4
    N = blk * nsh
    layout = Layout(N, nshards=nsh)
    rng = np.random.default_rng(0)
    # every shard reads from (almost) every other shard -> allgather plan
    leaves = [np.sort(rng.choice(N, size=9, replace=False))
              for _ in range(nsh)]
    plan = ExchangePlan(layout, leaves, axis=comm.axis, max_neighbors=2)
    assert plan.use_allgather
    tables = plan.device_tables(comm.mesh)
    meta = plan.meta()
    H = plan.H
    lv = np.zeros((nsh, H))
    for s in range(nsh):
        lv[s, : len(leaves[s])] = rng.random(len(leaves[s]))

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def run(tables, lvl):
        out = ExchangePlan.reduce_add(meta, tables, lvl.reshape(-1), blk,
                                      comm.axis)
        return out.reshape(1, -1)

    sf_specs = {k: P(comm.axis, None) for k in tables}
    out = shard_map(run, mesh=comm.mesh,
                    in_specs=(sf_specs, P(comm.axis, None)),
                    out_specs=P(comm.axis, None))(
        tables, jnp.asarray(lv))
    got = np.asarray(out).reshape(-1)
    ref = np.zeros(N)
    for s in range(nsh):
        np.add.at(ref, leaves[s], lv[s, : len(leaves[s])])
    assert np.allclose(got, ref)


def test_sf_gather_and_degree():
    nsh = 4
    comm = make_comm(nsh)
    blk = 3
    layout = Layout(blk * nsh, nshards=nsh)
    leaves = [np.array([0, 5, 0]), np.array([5]), np.array([2, 0]),
              np.array([], dtype=np.int64)]
    plan = ExchangePlan(layout, leaves, axis=comm.axis)
    deg = plan.degree()
    assert deg[0] == 3 and deg[5] == 2 and deg[2] == 1
    H = plan.H
    lv = np.zeros((nsh, H))
    lv[0, :3] = [1.0, 2.0, 3.0]
    lv[1, :1] = [4.0]
    lv[2, :2] = [5.0, 6.0]
    out = np.asarray(plan.gather(comm.mesh, jnp.asarray(lv)))
    out = out.reshape(blk * nsh, -1)
    # root 0 receives 1,3 (shard0 slots) and 6 (shard2) in shard-major order
    assert sorted(out[0][out[0] != 0].tolist()) == [1.0, 3.0, 6.0]
    assert sorted(out[5][out[5] != 0].tolist()) == [2.0, 4.0]
    assert out[2][0] == 5.0


def test_sf_fetch_and_add():
    nsh = 4
    comm = make_comm(nsh)
    blk = 2
    N = blk * nsh
    layout = Layout(N, nshards=nsh)
    leaves = [np.array([4]), np.array([4]), np.array([4, 1]),
              np.array([], dtype=np.int64)]
    plan = ExchangePlan(layout, leaves, axis=comm.axis)
    x = jnp.arange(N, dtype=jnp.float64) * 10.0
    xs = jax.device_put(x, comm.row_sharding())
    H = plan.H
    lv = np.zeros((nsh, H))
    lv[0, 0] = 1.0
    lv[1, 0] = 2.0
    lv[2, :2] = [3.0, 7.0]
    fetched, updated = plan.fetch_and_add(comm.mesh, xs, jnp.asarray(lv))
    fetched = np.asarray(fetched)
    updated = np.asarray(updated).reshape(-1)
    # deterministic shard-major slots at root 4: shard0 (+1), shard1 (+2),
    # shard2 (+3) -> fetches 40, 41, 43
    assert fetched[0, 0] == 40.0
    assert fetched[1, 0] == 41.0
    assert fetched[2, 0] == 43.0
    assert fetched[2, 1] == 10.0          # root 1, single leaf
    assert updated[4] == 40.0 + 6.0
    assert updated[1] == 10.0 + 7.0


def test_sf_compose():
    nsh = 2
    comm = make_comm(nsh)
    layout = Layout(8, nshards=nsh)
    planA = ExchangePlan(layout, [np.array([4, 6]), np.array([1, 3])],
                         axis=comm.axis)
    # B's leaves index positions in A's per-shard leaf arrays
    planB = ExchangePlan(Layout(4, nshards=nsh),
                         [np.array([1]), np.array([0, 1])], axis=comm.axis)
    comp = planA.compose(planB)
    assert comp.leaves_per_shard[0].tolist() == [6]
    assert comp.leaves_per_shard[1].tolist() == [1, 3]


def test_trisolve_transpose():
    """x = A^{-T} b through the factored ILU(0)/LU plans (MatSolveTranspose
    role) — exercised via -pc_factor_transpose_solve + applyTranspose."""
    import scipy.sparse as sp
    from petsc_tpu.mat import factor
    from petsc_tpu.ops import trisolve
    rng = np.random.default_rng(0)
    n = 60
    A = (sp.random(n, n, density=0.12, random_state=1)
         + 10 * sp.eye(n)).tocsr()
    L, U, dinv = factor.ilu0(A.indptr, A.indices, A.data)
    tail, data = trisolve.make_trisolve_plan(L, U, dinv)
    data.update(trisolve.make_transpose_tables(L, U, dinv))
    m, nlevL, nlevU = tail
    b = rng.random(n)
    xt = np.asarray(trisolve.trisolve_transpose_apply(
        data, jnp.asarray(b), m, nlevL, nlevU))
    Lm = sp.csr_matrix((L[2], L[1], L[0]), shape=(n, n)).toarray() + np.eye(n)
    Um = sp.csr_matrix((U[2], U[1], U[0]), shape=(n, n)).toarray() \
        + np.diag(1.0 / dinv)
    ref = np.linalg.solve(Lm.T, np.linalg.solve(Um.T, b))
    assert np.allclose(xt, ref)


def test_pc_lu_transpose_solve_option():
    """PCApplyTranspose through the permuted LU plan."""
    import scipy.sparse as sp
    n = 40
    A = (sp.random(n, n, density=0.2, random_state=2)
         + 6 * sp.eye(n)).tocsr()
    pt.init(args=["-pc_factor_transpose_solve", "1"])
    Am = pt.MatAIJ.from_scipy(A)
    pc = pt.PC()
    pc.setOperators(Am, Am)
    pc.setType("lu")
    pc.setFromOptions()
    pc.setUp()
    from petsc_tpu.ops import operator
    op = operator.bind(pc.meta, pc.device_data())
    assert op.mult_t is not None
    b = np.random.default_rng(1).random(n)
    got = np.asarray(op.mult_t(jnp.asarray(b)))[:n]
    ref = np.linalg.solve(A.toarray().T, b)
    assert np.allclose(got, ref, atol=1e-10)
