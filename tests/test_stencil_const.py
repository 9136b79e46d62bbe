"""Constant-coefficient stencil folding (stencil_build.build_dnd →
aij_dnd binder with per-offset scalars in meta). The fold is legal
because the mult's zero padding already supplies the boundary clip;
mult and mult_t must match the assembled CSR exactly."""

import numpy as np

import petsc_tpu as pt
from petsc_tpu.ops import operator, stencil_build


def _poisson3d_27pt(n):
    import scipy.sparse as sp
    offs = [(dx, dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
            for dx in (-1, 0, 1) if (dx, dy, dz) != (0, 0, 0)]
    N = n ** 3
    idx = np.arange(N)
    z, r = divmod(idx, n * n)
    y, x = divmod(r, n)
    rows, cols, vals = [idx], [idx], [np.full(N, 26.0)]
    for dx, dy, dz in offs:
        xx, yy, zz = x + dx, y + dy, z + dz
        ok = ((xx >= 0) & (xx < n) & (yy >= 0) & (yy < n)
              & (zz >= 0) & (zz < n))
        rows.append(idx[ok])
        cols.append((zz * n * n + yy * n + xx)[ok])
        vals.append(np.full(ok.sum(), -1.0))
    return sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(N, N))


def test_const_folded_box_matches_csr():
    n = 10
    meta, data = stencil_build.build_dnd((n, n, n), kind="box")
    # all 27 planes folded to scalars; no coefficient array stored
    assert len(meta) == 7 and all(c is not None for c in meta[6])
    assert data["coef"].shape[0] == 0
    op = operator.bind(meta, data)
    A = _poisson3d_27pt(n)
    x = np.random.default_rng(0).random(n ** 3)
    np.testing.assert_allclose(np.asarray(op.mult(x)), A @ x,
                               rtol=1e-13, atol=1e-11)
    np.testing.assert_allclose(np.asarray(op.mult_t(x)), A.T @ x,
                               rtol=1e-13, atol=1e-11)


def test_const_folded_star_diag():
    n = 8
    meta, data = stencil_build.build_dnd((n, n, n), kind="star")
    op = operator.bind(meta, data)
    d = np.asarray(op.diag())
    np.testing.assert_allclose(d, np.full(n ** 3, 6.0))
    # row sums: interior rows 0, face rows 1..3 missing neighbors
    y = np.asarray(op.mult(np.ones(n ** 3)))
    assert abs(y.reshape(n, n, n)[4, 4, 4]) < 1e-13
    assert abs(y.reshape(n, n, n)[0, 4, 4] - 1.0) < 1e-13
    assert abs(y.reshape(n, n, n)[0, 0, 0] - 3.0) < 1e-13


def test_as_mat_ksp_solve():
    """stencil_build.as_mat wraps (meta, data) as a first-class Mat whose
    arrays ride the jit contract as arguments (examples/poisson512.py)."""
    n = 12
    meta, data = stencil_build.build_dnd((n, n, n), kind="star")
    A = stencil_build.as_mat(meta, data)
    assert A.nnz() == stencil_build.nnz_of((n, n, n), meta[2])
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-8)
    b = A.createVecLeft()
    b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason() > 0
    y = np.asarray(pt.Vec.from_array(np.asarray(A.op().mult(x.array))).getArray())
    np.testing.assert_allclose(y[: n ** 3], np.ones(n ** 3), atol=1e-6)


def test_amat_pmat_split_gamg():
    """PETSc's Amat/Pmat contract: a device-generated stencil operator as
    the applied Amat with a host_only CSR Pmat driving the GAMG setup —
    no device build of the Pmat ever happens (the 512^3 on-chip recipe)."""
    import scipy.sparse as sp
    n = 12
    meta, data = stencil_build.build_dnd((n, n, n), kind="star")
    A = stencil_build.as_mat(meta, data)
    # host twin (same operator assembled on host)
    import sys as _s, os as _o
    _s.path.insert(0, _o.path.dirname(_o.path.dirname(
        _o.path.abspath(__file__))))
    from examples.poisson_scale import poisson7_csr
    ip, ix, v = poisson7_csr(n)
    Pm = pt.MatAIJ.from_scipy(sp.csr_matrix((v, ix, ip),
                                            shape=(n ** 3, n ** 3)),
                              host_only=True)
    assert Pm._dev is None                    # never built device arrays
    ksp = pt.KSP().create()
    ksp.setOperators(A, Pm)
    ksp.setType("cg")
    ksp.getPC().setType("gamg")
    ksp.setTolerances(rtol=1e-8)
    b = A.createVecLeft()
    b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason() > 0
    assert ksp.getIterationNumber() <= 12
    assert Pm._dev is None                    # still host-only after solve
    r = np.asarray(A.op().mult(x.array))[: n ** 3] - 1.0
    assert np.linalg.norm(r) / n ** 1.5 < 1e-7


def test_separable_fast_path_star_2d_and_box_2d():
    """The uniform-coefficient box/star fast path (round 3): mult factors
    through 1-D 3-tap box filters; must match the assembled CSR exactly
    and satisfy A^T = A (symmetric pattern + uniform coefficients)."""
    import scipy.sparse as sp
    rng = np.random.default_rng(3)
    for kind in ("box", "star"):
        n = 9
        meta, data = stencil_build.build_dnd((n, n), kind=kind)
        op = operator.bind(meta, data)
        offs = meta[2]
        N = n * n
        idx = np.arange(N)
        yy, xx = divmod(idx, n)
        rows, cols, vals = [], [], []
        for (dy, dx) in offs:
            c = float(len(offs) - 1) if (dy, dx) == (0, 0) else -1.0
            ny_, nx_ = yy + dy, xx + dx
            ok = (ny_ >= 0) & (ny_ < n) & (nx_ >= 0) & (nx_ < n)
            rows.append(idx[ok])
            cols.append((ny_ * n + nx_)[ok])
            vals.append(np.full(ok.sum(), c))
        A = sp.csr_matrix((np.concatenate(vals),
                           (np.concatenate(rows), np.concatenate(cols))),
                          shape=(N, N))
        x = rng.random(N)
        np.testing.assert_allclose(np.asarray(op.mult(x)), A @ x,
                                   rtol=1e-13, atol=1e-12)
        np.testing.assert_allclose(np.asarray(op.mult_t(x)), A.T @ x,
                                   rtol=1e-13, atol=1e-12)


def test_variable_coef_slab_path_matches_generic():
    """Slab-blocked variable-coefficient mult (round 3): force the slab
    chunking at test size via the module knob and check against the
    un-chunked generic path and the masked-constant reference."""
    from petsc_tpu.mat import aij as aij_mod
    n = 12
    meta_c, data_c = stencil_build.build_dnd((n, n, n), kind="box")
    meta_v, data_v = stencil_build.build_dnd((n, n, n), kind="box",
                                             variable=True)
    assert len(meta_v) == 6            # no folded scalars
    assert data_v["coef"].shape[0] == len(meta_v[2])
    x = np.random.default_rng(4).random(n ** 3)
    ref = np.asarray(operator.bind(meta_c, data_c).mult(x))

    # generic (un-chunked) variable path at this size
    y_gen = np.asarray(operator.bind(meta_v, data_v).mult(x))
    np.testing.assert_allclose(y_gen, ref, rtol=1e-13, atol=1e-12)

    # force slab chunking: ~2-plane slabs
    old = aij_mod._SLAB_TARGET_BYTES
    aij_mod._SLAB_TARGET_BYTES = n * n * 8 * 2
    try:
        y_slab = np.asarray(operator.bind(meta_v, data_v).mult(x))
    finally:
        aij_mod._SLAB_TARGET_BYTES = old
    np.testing.assert_allclose(y_slab, ref, rtol=1e-13, atol=1e-12)

    # non-divisible chunk count: n=12 with cz=5 exercises the clamped
    # overlapping last chunk
    aij_mod._SLAB_TARGET_BYTES = n * n * 8 * 5
    try:
        y_slab5 = np.asarray(operator.bind(meta_v, data_v).mult(x))
    finally:
        aij_mod._SLAB_TARGET_BYTES = old
    np.testing.assert_allclose(y_slab5, ref, rtol=1e-13, atol=1e-12)
