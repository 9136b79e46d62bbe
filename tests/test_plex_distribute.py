"""DMPlex distribution (plexdistribute.c role, TPU-native shape).

Covers: cell partition + owner-grouped migration renumbering, per-shard
submeshes (owned cells, closure, overlap rings), the point SF over ghost
vertices (device bcast/reduce through ExchangePlan), and per-shard P1
assembly with the off-process row stash into a ShardedCSR-backed MPIAIJ —
distributed matrix/rhs/solution must match the serial assembly under the
migration permutation (reference: src/dm/impls/plex/plexdistribute.c
DMPlexDistribute/DMPlexDistributeOverlap; src/mat/utils/matstash.c)."""

import numpy as np
import pytest

import petsc_tpu as pt
from petsc_tpu.dm.plex import DMPlex
from petsc_tpu.parallel.mesh import make_comm


def _serial_and_distributed(faces=(8, 8), nshards=4, overlap=0):
    serial = DMPlex.createBoxMesh(faces, simplex=True)
    dist = DMPlex.createBoxMesh(faces, simplex=True,
                                comm=make_comm(nshards)).distribute(overlap)
    return serial, dist


def test_distribute_is_identity_on_one_shard():
    p = DMPlex.createBoxMesh((4, 4), simplex=True)
    assert p.distribute() is p


def test_migration_renumbering_consistent():
    serial, dist = _serial_and_distributed()
    perm = dist.migration["vertex_perm"]          # new -> old
    cperm = dist.migration["cell_perm"]
    np.testing.assert_allclose(dist.coords, serial.coords[perm])
    # cells carry the same vertex coordinates after both renumberings
    np.testing.assert_allclose(dist.coords[dist.cells],
                               serial.coords[serial.cells[cperm]])
    # every shard's owned cells cover the mesh exactly once
    d = dist.distribution
    allc = np.concatenate(d.own_cells)
    assert len(allc) == dist.ncells
    assert len(np.unique(allc)) == dist.ncells


def test_overlap_ring_grows_submesh():
    _, dist = _serial_and_distributed(overlap=1)
    d = dist.distribution
    for s in range(d.nshards):
        own = set(d.own_cells[s].tolist())
        loc = set(d.local_cells[s].tolist())
        assert own <= loc
    # with 4 shards on an 8x8 box at least one shard sees neighbor cells
    assert any(len(d.local_cells[s]) > len(d.own_cells[s])
               for s in range(d.nshards))


def test_point_sf_ghost_bcast_and_reduce():
    import jax
    import jax.numpy as jnp
    _, dist = _serial_and_distributed()
    d = dist.distribution
    vl = d.vertex_layout
    sh = dist.comm.row_sharding()
    x = jax.device_put(jnp.arange(vl.Npad, dtype=jnp.float64), sh)
    halo = np.asarray(d.ghost_values(x))          # (P, H)
    for s in range(d.nshards):
        gh = d.ghosts[s]
        np.testing.assert_allclose(halo[s, : len(gh)], gh.astype(float))
    # reduce: ones at every ghost slot accumulate the SF degree at owners
    lv = np.zeros((d.nshards, d.point_sf.H))
    for s in range(d.nshards):
        lv[s, : len(d.ghosts[s])] = 1.0
    y = np.asarray(d.ghost_reduce(jnp.asarray(lv),
                                  jax.device_put(
                                      jnp.zeros(vl.Npad), sh)))
    deg = d.point_sf.degree()
    np.testing.assert_allclose(y[: vl.N], deg.astype(float))


@pytest.mark.parametrize("faces", [(8, 8), (4, 4, 4)])
def test_distributed_assembly_matches_serial(faces):
    serial, dist = _serial_and_distributed(faces=faces)
    A0, b0 = serial.assemblePoissonP1()
    A1, b1 = dist.assemblePoissonP1()
    perm = dist.migration["vertex_perm"]
    As = A0.to_scipy()[perm][:, perm]
    Ad = A1.to_scipy()
    assert abs(Ad - As).max() < 1e-12
    nv = serial.nvertices
    np.testing.assert_allclose(np.asarray(b1.getArray())[:nv],
                               np.asarray(b0.getArray())[:nv][perm],
                               atol=1e-14)


def test_distributed_poisson_solve_nshards4():
    serial, dist = _serial_and_distributed(faces=(10, 10))
    A0, b0 = serial.assemblePoissonP1()
    ksp0 = pt.KSP().create()
    ksp0.setOperators(A0)
    ksp0.setType("cg")
    ksp0.getPC().setType("jacobi")
    ksp0.setTolerances(rtol=1e-10)
    x0 = A0.createVecRight()
    ksp0.solve(b0, x0)

    A1, b1 = dist.assemblePoissonP1()
    ksp1 = pt.KSP().create()
    ksp1.setOperators(A1)
    ksp1.setType("cg")
    ksp1.getPC().setType("jacobi")
    ksp1.setTolerances(rtol=1e-10)
    x1 = A1.createVecRight()
    ksp1.solve(b1, x1)
    assert ksp1.getConvergedReason() > 0

    perm = dist.migration["vertex_perm"]
    nv = serial.nvertices
    np.testing.assert_allclose(np.asarray(x1.getArray())[:nv],
                               np.asarray(x0.getArray())[:nv][perm],
                               rtol=1e-7, atol=1e-9)


def test_distributed_p2_fem_assembly_and_solve():
    """Distributed HIGHER-ORDER FEM: P2 Lagrange weak-form Jacobian
    assembled per shard into a ShardedCSR-backed MPIAIJ
    (DS.assembleJacobianDistributed), solved with CG+jacobi, matching
    the serial DS assembly on the same (distributed-renumbered) mesh."""
    import jax.numpy as jnp
    from petsc_tpu.dm.fe import DS, lagrange_fe
    comm = make_comm(4)
    dist = DMPlex.createBoxMesh((6, 6), simplex=True,
                                comm=comm).distribute()
    fe = lagrange_fe(2, 2)
    ds = DS(dist, fe)
    f = lambda x: 2 * np.pi ** 2 * jnp.sin(jnp.pi * x[0]) \
        * jnp.sin(jnp.pi * x[1])
    ds.setResidual(f0=lambda u_, gu, x: -f(x), f1=lambda u_, gu, x: gu)
    bnd = ds.boundary_dofs(lambda x: x.min() < 1e-9 or x.max() > 1 - 1e-9)
    u0 = np.zeros(ds.ndof)
    A = ds.assembleJacobianDistributed(u0, comm, bnd=bnd)
    assert A.meta[0] == "mpiaij"
    F = ds.assembleResidualDistributed(u0, comm, bnd=bnd)
    # serial reference on the same DS
    As = ds.assembleJacobian(u0)
    # distributed matrix equals serial after bc elimination
    keep = np.ones(ds.ndof, bool)
    keep[bnd] = False
    Ad = A.to_scipy()
    import scipy.sparse as sp
    As_bc = As.tolil()
    for r in bnd:
        As_bc.rows[r] = [int(r)]
        As_bc.data[r] = [1.0]
    As_bc = As_bc.tocsr()
    coo = As_bc.tocoo()
    k2 = ~np.isin(coo.col, bnd) | (coo.row == coo.col)
    As_bc = sp.csr_matrix((coo.data[k2], (coo.row[k2], coo.col[k2])),
                          shape=As_bc.shape)
    assert abs(Ad - As_bc).max() < 1e-12
    # solve and check vs manufactured solution
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-12, max_it=2000)
    b = pt.Vec.from_array(-np.asarray(F.getArray())[: ds.ndof], comm=comm)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason() > 0
    u = np.asarray(x.getArray())[: ds.ndof]
    X = ds.dof_coords
    uex = np.sin(np.pi * X[:, 0]) * np.sin(np.pi * X[:, 1])
    assert np.abs(u - uex).max() < 5e-3
