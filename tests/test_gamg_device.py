"""Device-resident structured GAMG head (pc/gamg_device.py): Galerkin
RAP by period-3 stencil probing must equal the host Galerkin product
P^T A P exactly (boundary clips, even and odd grid sizes), the Lanczos
eig estimate must track D^-1 A's spectrum, and the full PCGAMG setup on
a grid operator must route through the device head without gathering
the fine operator."""

from itertools import product

import numpy as np
import pytest
import scipy.sparse as sp

import petsc_tpu as pt
from petsc_tpu.dm.interp import MatInterpQ1
from petsc_tpu.pc import gamg_device as gd


def _random_stencil(shape, seed=0):
    """Variable-coefficient {-1,0,1}^d stencil matrix + its CSR."""
    rng = np.random.default_rng(seed)
    nd, N = len(shape), int(np.prod(shape))
    idx = np.indices(shape).reshape(nd, -1)
    strides = np.array([int(np.prod(shape[d + 1:])) for d in range(nd)])
    rows_l, cols_l, vals_l = [], [], []
    for o in product((-1, 0, 1), repeat=nd):
        tgt = idx + np.asarray(o)[:, None]
        ok = np.ones(N, bool)
        for d in range(nd):
            ok &= (tgt[d] >= 0) & (tgt[d] < shape[d])
        v = rng.standard_normal(N) + (6.0 if not any(o) else 0.0)
        rows_l.append(np.nonzero(ok)[0])
        cols_l.append((strides @ tgt)[ok])
        vals_l.append(v[ok])
    return sp.csr_matrix(
        (np.concatenate(vals_l),
         (np.concatenate(rows_l), np.concatenate(cols_l))), shape=(N, N))


@pytest.mark.parametrize("shape", [(9, 8, 7), (8, 8), (7, 7), (6, 9)])
def test_device_rap_matches_host_galerkin(shape):
    A = _random_stencil(shape)
    Am = pt.MatAIJ.from_scipy(A)
    Am.setStencilGrid(shape)
    assert Am.meta[0] == "aij_dnd"
    # dnd -> CSR download round-trips the fine operator
    back = gd.dnd_to_csr(Am.meta, Am.device_data())
    assert abs(A - back).max() < 1e-13
    cshape = tuple((s + 1) // 2 for s in shape)
    cmeta, cdata = gd.device_rap_dnd(Am.meta, Am.device_data(), cshape)
    Ac = gd.dnd_to_csr(cmeta, cdata)
    P = MatInterpQ1(shape, cshape).to_scipy()
    assert abs(Ac - (P.T @ A @ P).tocsr()).max() < 1e-12


def test_device_rap_const_stencil():
    """The constant-folded dnd meta (stencil_build.build_dnd) probes
    identically to its materialized CSR twin."""
    from petsc_tpu.ops import stencil_build
    shape = (10, 10, 10)
    meta, data = stencil_build.build_dnd(shape, kind="star")
    A = gd.dnd_to_csr(meta, data)
    cshape = tuple((s + 1) // 2 for s in shape)
    cmeta, cdata = gd.device_rap_dnd(meta, data, cshape)
    Ac = gd.dnd_to_csr(cmeta, cdata)
    P = MatInterpQ1(shape, cshape).to_scipy()
    assert abs(Ac - (P.T @ A @ P).tocsr()).max() < 1e-12


def test_device_emax_tracks_spectrum():
    n = 12
    T = sp.diags([-1, 2.2, -1], [-1, 0, 1], (n, n))
    A = (sp.kron(T, sp.eye(n)) + sp.kron(sp.eye(n), T)).tocsr()
    Am = pt.MatAIJ.from_scipy(A)
    Am.setStencilGrid((n, n))
    em = gd.device_emax(Am.meta, Am.device_data())
    ref = np.max(np.abs(np.linalg.eigvals(
        np.diag(1.0 / A.diagonal()) @ A.toarray())))
    assert abs(em - ref) / ref < 0.06


def test_gamg_uses_device_head_and_converges():
    """End-to-end: grid operator routes through _structured_head_device
    (to_scipy of the fine level never called), converges like the host
    head, and -pc_gamg_structured_device 0 restores the host path with
    the same hierarchy."""
    import jax.numpy as jnp
    n = 24
    T = sp.diags([-1, 2.0, -1], [-1, 0, 1], (n, n))
    I = sp.eye(n)
    A = (sp.kron(sp.kron(T, I), I) + sp.kron(sp.kron(I, T), I)
         + sp.kron(sp.kron(I, I), T)).tocsr()
    its, kinds = {}, {}
    for dev in (1, 0):
        pt.init(args=["-pc_gamg_structured_device", str(dev),
                      "-pc_gamg_structured_limit", "300"])
        Am = pt.MatAIJ.from_scipy(A)
        Am.setStencilGrid((n, n, n))
        if dev:
            calls = []
            orig = type(Am).to_scipy

            def spy(self, _calls=calls, _orig=orig):
                _calls.append(self.getSize())
                return _orig(self)

            type(Am).to_scipy = spy
        try:
            ksp = pt.KSP().create()
            ksp.setOperators(Am)
            ksp.setType("cg")
            ksp.getPC().setType("gamg")
            ksp.getPC().setFromOptions()
            ksp.setTolerances(rtol=1e-8, max_it=60)
            b = Am.createVecLeft(); b.set(1.0)
            x = Am.createVecRight()
            ksp.solve(b, x)
        finally:
            if dev:
                type(Am).to_scipy = orig
        assert ksp.getConvergedReason().converged
        lev = ksp.getPC()._impl.levels
        kinds[dev] = [l.A.meta[0] for l in lev]
        its[dev] = ksp.getIterationNumber()
        if dev:
            # the fine operator (13824 rows) must never be gathered;
            # only sub-limit tail matrices may cross to host
            assert all(sz[0] <= 300 for sz in calls), calls
    assert kinds[1][:2] == ["aij_dnd", "aij_dnd"], kinds[1]
    assert its[1] <= its[0] + 2, (its, kinds)
