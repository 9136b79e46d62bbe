"""Post-adaptation distribution (r4 VERDICT item 6): after adaptLabel,
the refined plex redistributes (partition + migrate via distribute()),
reassembles per shard into MPIAIJ with lifted Dirichlet data, and the
sharded AMR loop reproduces the serial loop's L2-error trajectory.
Ref: plexadapt.c + plexdistribute.c.
"""
import numpy as np

from examples import adaptive_poisson as ap


def test_sharded_amr_matches_serial_trajectory():
    serial = ap.main(["-rounds", "3"])
    shard = ap.main(["-rounds", "3", "-adapt_nshards", "4"])
    for (n1, e1), (n2, e2) in zip(serial["adaptive"], shard["adaptive"]):
        assert n1 == n2
        assert abs(e1 - e2) < 1e-8 * max(e1, 1e-12)


def test_dirichlet_lifting_distributed_matches_serial():
    """Nonhomogeneous Dirichlet data through the per-shard stash path
    equals the serial MatZeroRowsColumns lifting."""
    import petsc_tpu as pt
    from petsc_tpu.dm.plex import DMPlex
    from petsc_tpu.parallel.mesh import make_comm

    g = lambda x: x[0] ** 2 - x[1]
    ser = DMPlex.createBoxMesh((5, 5), simplex=True)
    As, bs = ser.assemblePoissonP1(f=1.0, dirichlet_value=g)
    import scipy.sparse.linalg as spla
    us = spla.spsolve(As.to_scipy().tocsc(),
                      np.asarray(bs.getArray())[: ser.nvertices])

    comm = make_comm(4)
    dist = DMPlex.createBoxMesh((5, 5), simplex=True,
                                comm=comm).distribute()
    Ad, bd = dist.assemblePoissonP1(f=1.0, dirichlet_value=g)
    ksp = pt.KSP().create().setType("cg")
    ksp.setOperators(Ad)
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-13, max_it=5000)
    x = Ad.createVecRight()
    ksp.solve(bd, x)
    assert ksp.getConvergedReason().converged
    ud = np.asarray(x.getArray())[: dist.nvertices]
    # compare at matching physical vertices (orders differ)
    o = np.lexsort(ser.coords.T)
    od = np.lexsort(dist.coords.T)
    assert np.allclose(us[o], ud[od], rtol=1e-8, atol=1e-10)
