"""ExchangePlan (PetscSF analog) tests — reference model:
src/vec/is/sf/tests and MatMult_MPIAIJ halo correctness at any nsize."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

import petsc_tpu as pt
from petsc_tpu.parallel.layout import Layout
from petsc_tpu.parallel.mesh import make_comm
from petsc_tpu.parallel.sf import ExchangePlan, VecScatter
from tests.test_mg_gamg import poisson2d, poisson3d


def _bcast_check(nsh, leaves):
    comm = make_comm(nsh)
    N = 8 * nsh
    layout = Layout(N, nshards=nsh)
    plan = ExchangePlan(layout, leaves, axis=comm.axis)
    tables = plan.device_tables(comm.mesh)
    meta = plan.meta()
    x = jnp.arange(N, dtype=jnp.float64) * 10.0
    from jax.sharding import NamedSharding
    xs = jax.device_put(x, NamedSharding(comm.mesh, P(comm.axis)))

    def run(tables, xl):
        halo = ExchangePlan.bcast(meta, tables, xl.reshape(-1), comm.axis)
        return halo.reshape(1, -1)

    sf_specs = {k: P(comm.axis, None) for k in tables}
    out = shard_map(run, mesh=comm.mesh,
                    in_specs=(sf_specs, P(comm.axis)),
                    out_specs=P(comm.axis, None))(tables, xs)
    out = np.asarray(out)
    for s, lv in enumerate(leaves):
        got = out[s, : len(lv)]
        assert np.allclose(got, np.asarray(lv) * 10.0), (s, got, lv)


def test_sf_neighbor_bcast():
    nsh = 4
    # each shard wants 3 values from next shard, 2 from previous
    leaves = []
    for s in range(nsh):
        nxt = ((s + 1) % nsh) * 8 + np.array([0, 3, 5])
        prv = ((s - 1) % nsh) * 8 + np.array([6, 7])
        leaves.append(np.concatenate([nxt, prv]))
    _bcast_check(nsh, leaves)


def test_sf_skip_shard():
    nsh = 4
    # shard s reads from s+2 (stride-2 neighbor) — non-adjacent permute
    leaves = [((s + 2) % nsh) * 8 + np.array([1, 4]) for s in range(nsh)]
    _bcast_check(nsh, leaves)


def test_sf_empty_leaves():
    nsh = 4
    leaves = [np.array([8 * ((s + 1) % nsh)]) if s % 2 == 0
              else np.zeros(0, dtype=np.int64) for s in range(nsh)]
    _bcast_check(nsh, leaves)


@pytest.mark.parametrize("nsh", [2, 4, 8])
def test_mpiaij_matches_serial(nsh):
    A_sp = poisson2d(16)
    A1 = pt.MatAIJ.from_scipy(A_sp)
    An = pt.MatAIJ.from_scipy(A_sp, comm=make_comm(nsh))
    x = np.random.default_rng(0).random(A_sp.shape[0])
    y1 = A1.createVecLeft(); An_y = An.createVecLeft()
    v1 = pt.Vec.from_array(x)
    A1.mult(v1, y1)
    vn = An.createVecRight(); vn.setArray(x)
    An.mult(vn, An_y)
    assert np.allclose(np.asarray(y1.getArray()),
                       np.asarray(An_y.getArray())[: A_sp.shape[0]])


def test_mpiaij_3d_sharded_cg():
    A_sp = poisson3d(12)
    comm = make_comm(8)
    A = pt.MatAIJ.from_scipy(A_sp, comm=comm)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-8, max_it=500)
    u = A.createVecRight(); u.set(1.0)
    b = A.createVecLeft(); A.mult(u, b)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    x.axpy(-1.0, u)
    assert float(x.norm()) < 1e-5


def test_vecscatter():
    x = pt.Vec.from_array(np.arange(10.0))
    y = pt.Vec.from_array(np.zeros(4))
    sc = VecScatter(x.layout, [7, 1, 3, 9], y.layout, [0, 1, 2, 3])
    sc.apply(x, y)
    assert np.allclose(np.asarray(y.getArray()), [7, 1, 3, 9])


def test_gamg_sharded():
    """Multi-shard GAMG: sharded fine level + replicated coarse levels
    (telescope/process-reduction pattern)."""
    A_sp = poisson3d(16)
    A = pt.MatAIJ.from_scipy(A_sp, comm=make_comm(8))
    A.setStencilGrid((16, 16, 16))
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("gamg")
    ksp.setTolerances(rtol=1e-8, max_it=100)
    u = A.createVecRight(); u.set(1.0)
    b = A.createVecLeft(); A.mult(u, b)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    assert ksp.getIterationNumber() <= 15
    x.axpy(-1.0, u)
    assert float(x.norm()) < 1e-5


def test_two_level_mesh_solve():
    """2x4 (DCN x ICI) mesh: rows sharded over the flattened axis pair;
    full CG solve on the slab-stencil path."""
    from petsc_tpu.parallel.mesh import make_comm2
    comm = make_comm2(2, 4)
    assert comm.nshards == 8
    A_sp = poisson3d(16)
    A = pt.MatAIJ.from_scipy(A_sp, comm=comm)
    A.setStencilGrid((16, 16, 16))
    assert A.meta[0] == "dnd_mpi"
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-8, max_it=500)
    u = A.createVecRight(); u.set(1.0)
    b = A.createVecLeft(); A.mult(u, b)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    x.axpy(-1.0, u)
    assert float(x.norm()) < 1e-5


def test_vecscatter_distributed_cross_layout():
    """Cross-layout distributed scatter: y[iy] = x[ix] with both vectors
    sharded over 4 devices — the ExchangePlan path (vscat.c MPI plan
    role), including ADD_VALUES accumulate."""
    rng = np.random.default_rng(5)
    comm = make_comm(4)
    xnp = rng.random(40)
    x = pt.Vec.from_array(xnp, comm=comm)
    y = pt.Vec.from_array(np.zeros(24), comm=comm)
    ix = rng.permutation(40)[:24]
    iy = rng.permutation(24)
    sc = VecScatter(x.layout, ix, y.layout, iy, comm=comm)
    assert sc.plan is not None           # distributed plan engaged
    sc.apply(x, y)
    expect = np.zeros(24)
    expect[iy] = xnp[ix]
    np.testing.assert_allclose(np.asarray(y.getArray())[:24], expect)
    # accumulate on top
    sc.apply(x, y, addv=True)
    np.testing.assert_allclose(np.asarray(y.getArray())[:24], 2 * expect)
