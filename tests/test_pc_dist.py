"""Distributed PC data paths (round-2 contract: bjacobi/asm setup must
follow the decomposition — per-shard blocks from ShardedCSR, overlap rows
via fetch_rows, per-shard trisolves inside shard_map; no full-operator
gather). Reference: src/ksp/pc/impls/bjacobi/bjacobi.c (one block per
rank), src/ksp/pc/impls/asm/asm.c + mpiov.c (MatIncreaseOverlap)."""

import numpy as np
import pytest

import petsc_tpu as pt
from petsc_tpu.parallel.mesh import make_comm
from tests.test_mg_gamg import poisson2d


def _solve(A_sp, comm, args, rtol=1e-8):
    pt.init(args=args)
    A = pt.MatAIJ.from_scipy(A_sp, comm=comm)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setTolerances(rtol=rtol)
    ksp.setFromOptions()
    b = A.createVecLeft()
    b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason() > 0
    return ksp, np.asarray(x.getArray())[: A_sp.shape[0]]


def test_bjacobi_dist_uses_pershard_path_and_matches_serial_blocks():
    A_sp = poisson2d(20)               # N=400, divisible by 4 shards
    kd, xd = _solve(A_sp, make_comm(4),
                    ["-ksp_type", "gmres", "-pc_type", "bjacobi"])
    # the distributed setup must have bound the per-shard kind
    assert kd.getPC().meta[0] == "pc_bjacobi_dist"
    # serial bjacobi with the same 4 contiguous blocks: identical algebra
    ks, xs = _solve(A_sp, None,
                    ["-ksp_type", "gmres", "-pc_type", "bjacobi",
                     "-pc_bjacobi_blocks", "4"])
    assert kd.getIterationNumber() == ks.getIterationNumber()
    np.testing.assert_allclose(xd, xs, rtol=1e-9, atol=1e-11)


def test_bjacobi_dist_converges_true_residual():
    A_sp = poisson2d(17)               # N=289 NOT divisible by 8 (padding)
    kd, xd = _solve(A_sp, make_comm(8),
                    ["-ksp_type", "gmres", "-pc_type", "bjacobi"])
    r = A_sp @ xd - 1.0
    assert np.linalg.norm(r) / np.linalg.norm(np.ones(len(xd))) < 1e-7


@pytest.mark.parametrize("asm_type", ["restrict", "basic"])
def test_asm_dist_converges(asm_type):
    A_sp = poisson2d(20)
    kd, xd = _solve(A_sp, make_comm(4),
                    ["-ksp_type", "gmres", "-pc_type", "asm",
                     "-pc_asm_type", asm_type])
    assert kd.getPC().meta[0] == "pc_asm_dist"
    r = A_sp @ xd - 1.0
    assert np.linalg.norm(r) / np.linalg.norm(np.ones(len(xd))) < 1e-7


def test_asm_dist_overlap_beats_bjacobi():
    """Overlap-1 ASM must converge in fewer (or equal) iterations than
    no-overlap block Jacobi on the same decomposition — the whole point
    of the overlap (asm.c)."""
    A_sp = poisson2d(24)
    ka, _ = _solve(A_sp, make_comm(4),
                   ["-ksp_type", "gmres", "-pc_type", "asm"])
    kb, _ = _solve(A_sp, make_comm(4),
                   ["-ksp_type", "gmres", "-pc_type", "bjacobi"])
    assert ka.getIterationNumber() <= kb.getIterationNumber()


def test_asm_dist_overlap2():
    A_sp = poisson2d(20)
    k2, x2 = _solve(A_sp, make_comm(4),
                    ["-ksp_type", "gmres", "-pc_type", "asm",
                     "-pc_asm_overlap", "2"])
    r = A_sp @ x2 - 1.0
    assert np.linalg.norm(r) / 20.0 < 1e-7


def test_fieldsplit_dist_schur_selfp():
    """Distributed fieldsplit: sub-blocks extracted per destination shard
    (ShardedCSR.submatrix — MatCreateSubMatrix_MPIAIJ role), selfp Schur
    preconditioner computed with per-shard algebra."""
    import scipy.sparse as sp
    n = 20
    A00 = poisson2d(n)
    rng = np.random.default_rng(0)
    B = sp.random(100, 400, density=0.02, random_state=rng, format="csr")
    A11 = sp.eye(100).tocsr() * 1e-6
    K = sp.bmat([[A00, B.T], [B, -A11]], format="csr")
    pt.init(args=["-pc_type", "fieldsplit", "-pc_fieldsplit_type", "schur",
                  "-pc_fieldsplit_schur_precondition", "selfp",
                  "-ksp_type", "fgmres"])
    A = pt.MatAIJ.from_scipy(K, comm=make_comm(4))
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setTolerances(rtol=1e-8, max_it=300)
    ksp.setFromOptions()
    ksp.getPC()._impl.setIS("0", np.arange(400))
    ksp.getPC()._impl.setIS("1", np.arange(400, 500))
    b = A.createVecLeft()
    b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason() > 0
    r = K @ np.asarray(x.getArray())[: K.shape[0]] - 1.0
    assert np.linalg.norm(r) < 1e-6


def test_fieldsplit_dist_multiplicative_matches_serial():
    A_sp = poisson2d(16)           # 256 rows, split into odd/even
    ix0 = np.arange(0, 256, 2)
    ix1 = np.arange(1, 256, 2)

    def run(comm):
        pt.init(args=["-pc_type", "fieldsplit",
                      "-pc_fieldsplit_type", "multiplicative",
                      "-ksp_type", "gmres"])
        A = pt.MatAIJ.from_scipy(A_sp, comm=comm)
        ksp = pt.KSP().create()
        ksp.setOperators(A)
        ksp.setTolerances(rtol=1e-9)
        ksp.setFromOptions()
        ksp.getPC()._impl.setIS("0", ix0)
        ksp.getPC()._impl.setIS("1", ix1)
        b = A.createVecLeft()
        b.set(1.0)
        x = A.createVecRight()
        ksp.solve(b, x)
        assert ksp.getConvergedReason() > 0
        return np.asarray(x.getArray())[:256]

    xs = run(None)
    xd = run(make_comm(4))
    np.testing.assert_allclose(xd, xs, rtol=1e-6, atol=1e-9)


def test_fieldsplit_dist_unsorted_is_matches_serial():
    """An UNSORTED field IS must produce the same preconditioner
    distributed as serial (ShardedCSR.submatrix restores caller order
    after the sorted fetch)."""
    A_sp = poisson2d(12)
    rng = np.random.default_rng(7)
    ix0 = rng.permutation(np.arange(0, 144, 2))     # unsorted even dofs
    ix1 = rng.permutation(np.arange(1, 144, 2))

    def run(comm):
        pt.init(args=["-pc_type", "fieldsplit",
                      "-pc_fieldsplit_type", "multiplicative",
                      "-ksp_type", "gmres"])
        A = pt.MatAIJ.from_scipy(A_sp, comm=comm)
        ksp = pt.KSP().create()
        ksp.setOperators(A)
        ksp.setTolerances(rtol=1e-9)
        ksp.setFromOptions()
        ksp.getPC()._impl.setIS("0", ix0)
        ksp.getPC()._impl.setIS("1", ix1)
        b = A.createVecLeft()
        b.set(1.0)
        x = A.createVecRight()
        ksp.solve(b, x)
        assert ksp.getConvergedReason() > 0
        return ksp.getIterationNumber(), np.asarray(x.getArray())[:144]

    # extraction-order invariant: the distributed sub-block equals the
    # serial scipy slice for the UNSORTED IS (fetch_rows sorts; submatrix
    # must restore caller order)
    from petsc_tpu.mat.shardcsr import ShardedCSR
    S = ShardedCSR.from_global_csr(A_sp.tocsr(), 4)
    blk = S.submatrix(ix0, ix1).to_global_csr()[: len(ix0), : len(ix1)]
    ref = A_sp.tocsr()[ix0][:, ix1]
    assert abs(blk - ref).max() < 1e-14
    # solutions agree (iteration counts may differ: the serial sub-PC is
    # one ILU block, the distributed default is per-shard bjacobi)
    _, xs = run(None)
    _, xd = run(make_comm(4))
    np.testing.assert_allclose(xd, xs, rtol=1e-6, atol=1e-9)


def test_pod_guess_multishard():
    """KSPGuess POD on a sharded operator (padded, shard_map mult)."""
    A_sp = poisson2d(17)          # N=289: layout padding on 4 shards
    pt.init(args=[])
    A = pt.MatAIJ.from_scipy(A_sp, comm=make_comm(4))
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-30, atol=1e-8, max_it=800)
    ksp.setGuessType("pod", size=5)
    t = np.linspace(0, 1, 289)
    its = []
    for k in range(4):
        b = pt.Vec.from_array(np.sin(2 * np.pi * (t + 0.02 * k)),
                              comm=A.comm)
        x = A.createVecRight()
        ksp.solve(b, x)
        assert ksp.getConvergedReason() > 0
        its.append(ksp.getIterationNumber())
    assert its[-1] < its[0]
