"""Distributed GAMG setup (per-shard, no global-matrix gather).

Covers the ShardedCSR primitives (transpose/spmm/ptap vs the global
product), the boundary-aware MIS aggregation, and the end-to-end
CG+GAMG distributed solve matching the serial hierarchy's convergence
(reference: mpiptap.c:215 scalable PtAP, mis.c:89 parallel MIS,
gamg.c:155-201 process reduction)."""

import numpy as np
import pytest
import scipy.sparse as sp

import petsc_tpu as pt
from petsc_tpu.mat.shardcsr import ShardedCSR
from tests.test_mg_gamg import poisson2d, poisson3d


def _rand_csr(m, n, density=0.05, seed=0):
    rng = np.random.default_rng(seed)
    A = sp.random(m, n, density=density, random_state=rng, format="csr")
    A.data += 1.0
    return A


@pytest.mark.parametrize("nshards", [3, 8])
def test_shardcsr_roundtrip_and_matvec(nshards):
    A = _rand_csr(37, 37)
    S = ShardedCSR.from_global_csr(A, nshards)
    G = S.to_global_csr()[:37, :37]
    assert abs(G - A).nnz == 0
    x = np.random.default_rng(1).random(S.col_layout.Npad)
    x[37:] = 0.0
    y = S.matvec(x)
    np.testing.assert_allclose(y[:37], A @ x[:37], rtol=1e-13)


def test_shardcsr_transpose_spmm_ptap_match_global():
    A = _rand_csr(40, 40, seed=2)
    A = A + A.T  # symmetric-ish pattern
    P = _rand_csr(40, 12, density=0.15, seed=3)
    S = ShardedCSR.from_global_csr(A.tocsr(), 4)
    SP = ShardedCSR.from_global_csr(P, 4)
    # transpose
    T = S.transpose().to_global_csr()[:40, :40]
    assert abs(T - A.T).max() < 1e-13
    # spmm (A @ P) with per-shard halo fetches
    C = S.spmm(SP).to_global_csr()[:40, :SP.col_layout.Npad]
    Cg = (A @ sp.hstack([P, sp.csr_matrix(
        (40, SP.col_layout.Npad - 12))])).tocsr()
    assert abs(C - Cg).max() < 1e-12
    # ptap
    R = S.ptap(SP).to_global_csr()
    Pg = sp.hstack([P, sp.csr_matrix((40, SP.col_layout.Npad - 12))]).tocsr()
    Rg = (Pg.T @ A @ Pg).tocsr()
    assert abs(R[:Rg.shape[0], :Rg.shape[1]] - Rg).max() < 1e-12


def test_shardcsr_fetch_rows():
    A = _rand_csr(30, 30, seed=5)
    S = ShardedCSR.from_global_csr(A, 4)
    want = np.array([0, 7, 8, 15, 29])
    F = S.fetch_rows(want)
    assert abs(F[:, :30] - A[want]).max() < 1e-14


def test_dist_mis_covers_all_vertices():
    from petsc_tpu.pc.gamg_dist import dist_mis_aggregate, dist_strength_graph
    A = poisson2d(16)
    S = ShardedCSR.from_global_csr(A, 4)
    G = dist_strength_graph(S)
    agg_root, state = dist_mis_aggregate(G)
    n = 256
    # every real vertex is rooted or taken (no 1-entry rows in a Poisson
    # graph => nothing removed), and roots form an independent set in G
    assert (agg_root[:n] >= 0).all()
    roots = np.nonzero(state[:n] == 1)[0]
    Gg = G.to_global_csr()[:n, :n].tocsr()
    for r in roots:
        nbrs = Gg.indices[Gg.indptr[r]:Gg.indptr[r + 1]]
        assert not np.isin(nbrs[nbrs != r], roots).any()


def test_from_sharded_mult_matches_global():
    A = poisson2d(12)
    comm = pt.make_comm(8)
    S = ShardedCSR.from_global_csr(A, 8)
    M = pt.MatAIJ.from_sharded(S, comm)
    n = A.shape[0]
    x = np.random.default_rng(7).random(S.col_layout.Npad)
    x[n:] = 0.0
    xv = pt.Vec(comm).setLayout(M.col_layout)
    xv.setUp(); xv.setArray(x[:M.col_layout.N])
    yv = M.createVecLeft()
    M.mult(xv, yv)
    np.testing.assert_allclose(yv.getArray()[:n], A @ x[:n], rtol=1e-12)


@pytest.mark.parametrize("mk,n,maxit", [(poisson2d, 32, 12),
                                        (poisson3d, 12, 12)])
def test_gamg_dist_matches_serial_convergence(mk, n, maxit):
    A = mk(n)
    N = A.shape[0]
    rhs = np.ones(N)

    def run(mat, comm=None):
        ksp = pt.KSP().create()
        ksp.setOperators(mat)
        ksp.setType("cg")
        ksp.getPC().setType("gamg")
        ksp.setTolerances(rtol=1e-8)
        if comm is None:
            b = pt.Vec.from_array(rhs)
        else:
            b = pt.Vec(comm).setLayout(mat.col_layout)
            b.setUp(); b.setArray(rhs)
        x = mat.createVecRight()
        ksp.solve(b, x)
        return ksp, x.getArray()[:N]

    pt.init(args=["-pc_gamg_dist_coarse_limit", "120"])
    ks, xs = run(pt.MatAIJ.from_scipy(A))
    comm = pt.make_comm(8)
    Mp = pt.MatAIJ(comm)
    Mp.setSizes((N, N))
    Mp.setValuesCSR(A.indptr, A.indices, A.data)
    Mp.assemble()
    kp, xp = run(Mp, comm)
    assert kp.getConvergedReason().converged
    assert kp.getIterationNumber() <= maxit
    # distributed hierarchy: fine sharded, first coarse level still sharded
    kinds = [lev.A.meta[0] for lev in kp.getPC()._impl.levels]
    assert kinds[0] in ("mpiaij", "dnd_mpi")
    assert kinds[1] == "mpiaij", kinds
    np.testing.assert_allclose(
        np.linalg.norm(xp - xs) / np.linalg.norm(xs), 0.0, atol=1e-6)


def test_gamg_dist_no_global_gather(monkeypatch):
    """The sharded setup path must never call to_scipy()/to_global_csr on
    the FINE operator (the round-1 full-gather anti-pattern)."""
    A = poisson2d(24)
    N = A.shape[0]
    comm = pt.make_comm(8)
    Mp = pt.MatAIJ(comm)
    Mp.setSizes((N, N))
    Mp.setValuesCSR(A.indptr, A.indices, A.data)
    Mp.assemble()

    def boom(*a, **k):
        raise AssertionError("to_scipy() called on the sharded fine operator")
    monkeypatch.setattr(Mp, "to_scipy", boom)
    pc = pt.PC().create()
    pc.setOperators(Mp, Mp)
    pc.setType("gamg")
    pc.setUp()
    kinds = [lev.A.meta[0] for lev in pc._impl.levels]
    assert kinds[0] in ("mpiaij", "dnd_mpi")


def test_gamg_sharded_nondivisible_rows():
    """N % nshards != 0 through the serial continuation: the factored
    prolongator must pad to the sharded fine operator's Npad (round-2
    fix — previously crashed in shard_map with a divisibility error)."""
    A_sp = poisson2d(17)            # N=289 over 8 shards
    from petsc_tpu.parallel.mesh import make_comm
    A = pt.MatAIJ.from_scipy(A_sp, comm=make_comm(8))
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("gamg")
    ksp.setTolerances(rtol=1e-8)
    b = A.createVecLeft()
    b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason() > 0
    r = A_sp @ np.asarray(x.getArray())[:289] - 1.0
    assert np.linalg.norm(r) < 1e-5
