"""Level-scheduled sparse triangular solves on device.

TPU-native replacement for MatSolve_SeqAIJ (reference
src/mat/impls/aij/seq/aijfact.c:2460 — sequential forward/backward sweeps)
and the cuSPARSE csrsv analysis/solve pair (aijcusparse.cu): rows are grouped
into dependency levels (all rows in one level depend only on earlier levels),
each level is solved as one vectorized gather/scatter step, and the level
loop is a lax.fori_loop with static trip count. The sequential depth is the
number of levels (≈ grid diameter for stencil ILU0), which block-Jacobi
bounds per block.

Padding convention: level row-lists are padded with `m` (out of range);
gathers clip, scatters drop.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def levels_from_csr(indptr, indices, lower: bool):
    """Dependency levels for a strictly-triangular CSR (host symbolic).

    lower=True: row i depends on cols j < i (forward solve order).
    lower=False: row i depends on cols j > i (backward solve order).
    Returns (levels (m,), nlevels).
    """
    m = len(indptr) - 1
    from .. import native
    out = native.levels(np.asarray(indptr, dtype=np.int64),
                        np.asarray(indices, dtype=np.int64), lower)
    if out is not None:
        lev, nlev = out
        return lev, nlev
    lev = np.zeros(m, dtype=np.int64)
    order = range(m) if lower else range(m - 1, -1, -1)
    for i in order:
        cols = indices[indptr[i]:indptr[i + 1]]
        if len(cols):
            lev[i] = lev[cols].max() + 1
    return lev, int(lev.max()) + 1 if m else 1


def build_level_table(lev, nlev, m):
    """Pad per-level row lists to a uniform width G; sentinel = m."""
    counts = np.bincount(lev, minlength=nlev)
    G = max(int(counts.max()), 1)
    table = np.full((nlev, G), m, dtype=np.int64)
    fill = np.zeros(nlev, dtype=np.int64)
    for i, l in enumerate(lev):
        table[l, fill[l]] = i
        fill[l] += 1
    return table


def ell_of_csr(indptr, indices, vals, m, K=None):
    """Dense-padded ELL of a CSR (host)."""
    rl = np.diff(indptr)
    K = max(int(rl.max()) if len(rl) else 0, 1) if K is None else K
    data = np.zeros((m, K))
    idx = np.zeros((m, K), dtype=np.int32)
    rows = np.repeat(np.arange(m), rl)
    pos = np.arange(len(indices)) - np.repeat(indptr[:-1], rl)
    data[rows, pos] = vals
    idx[rows, pos] = indices
    return data, idx


def make_trisolve_plan(L, U, dinv):
    """Host symbolic phase. L: strict-lower CSR triple, U: strict-upper CSR
    triple (both numpy), dinv: inverse of U's diagonal. Returns (meta_tail,
    device dict) for the solve x = U^{-1} L^{-1} b with unit L."""
    m = len(dinv)
    Li, Lj, Lv = L
    Ui, Uj, Uv = U
    levL, nlevL = levels_from_csr(Li, Lj, lower=True)
    levU, nlevU = levels_from_csr(Ui, Uj, lower=False)
    tabL = build_level_table(levL, nlevL, m)
    tabU = build_level_table(levU, nlevU, m)
    Ld, Lx = ell_of_csr(Li, Lj, Lv, m)
    Ud, Ux = ell_of_csr(Ui, Uj, Uv, m)
    data = {
        "Ld": jnp.asarray(Ld), "Lx": jnp.asarray(Lx),
        "Ud": jnp.asarray(Ud), "Ux": jnp.asarray(Ux),
        "tabL": jnp.asarray(tabL), "tabU": jnp.asarray(tabU),
        "dinv": jnp.asarray(dinv),
    }
    meta_tail = (m, nlevL, nlevU)
    return meta_tail, data


def trisolve_apply(data, b, m, nlevL, nlevU):
    """x = U^{-1} L^{-1} b, level by level, fully on device."""
    Ld, Lx, Ud, Ux = data["Ld"], data["Lx"], data["Ud"], data["Ux"]
    tabL, tabU, dinv = data["tabL"], data["tabU"], data["dinv"]
    bl = b[:m]

    def fwd(l, y):
        rows = tabL[l]                      # (G,) with sentinel m
        rr = jnp.minimum(rows, m - 1)
        contrib = jnp.sum(Ld[rr] * y[Lx[rr]], axis=1)
        vals = bl[rr] - contrib
        return y.at[rows].set(vals, mode="drop")

    y = lax.fori_loop(0, nlevL, fwd, jnp.zeros_like(bl))

    def bwd(l, x):
        rows = tabU[l]
        rr = jnp.minimum(rows, m - 1)
        contrib = jnp.sum(Ud[rr] * x[Ux[rr]], axis=1)
        vals = (y[rr] - contrib) * dinv[rr]
        return x.at[rows].set(vals, mode="drop")

    x = lax.fori_loop(0, nlevU, bwd, jnp.zeros_like(bl))
    if b.shape[0] > m:
        x = jnp.pad(x, (0, b.shape[0] - m))
    return x


def unit_lower_solve(Ld, Lx, tabL, b, m, nlevL):
    """y = (I + L)^{-1} b (unit strict-lower), level-scheduled."""
    bl = b[:m]

    def fwd(l, y):
        rows = tabL[l]
        rr = jnp.minimum(rows, m - 1)
        contrib = jnp.sum(Ld[rr] * y[Lx[rr]], axis=1)
        return y.at[rows].set(bl[rr] - contrib, mode="drop")

    y = lax.fori_loop(0, nlevL, fwd, jnp.zeros_like(bl))
    if b.shape[0] > m:
        y = jnp.pad(y, (0, b.shape[0] - m))
    return y


def unit_upper_solve(Ud, Ux, tabU, b, m, nlevU):
    """y = (I + U)^{-1} b (unit strict-upper), level-scheduled."""
    bl = b[:m]

    def bwd(l, x):
        rows = tabU[l]
        rr = jnp.minimum(rows, m - 1)
        contrib = jnp.sum(Ud[rr] * x[Ux[rr]], axis=1)
        return x.at[rows].set(bl[rr] - contrib, mode="drop")

    x = lax.fori_loop(0, nlevU, bwd, jnp.zeros_like(bl))
    if b.shape[0] > m:
        x = jnp.pad(x, (0, b.shape[0] - m))
    return x


def make_transpose_tables(L, U, dinv):
    """Tables for the TRANSPOSE solve x = A^{-T} b = (I+L)^{-T} (D+U)^{-T} b
    (MatSolveTranspose_SeqAIJ, aijfact.c): (D+U)^T = D + strictU^T is lower
    triangular (forward sweep with diagonal scaling), (I+L)^T = I + strictL^T
    is unit upper (backward sweep). Returns extra device-table entries to
    merge into a trisolve plan's data dict.

    The level counts equal the forward plan's (longest dependency chain in a
    DAG is invariant under edge reversal), so trisolve_transpose_apply reuses
    the same (m, nlevL, nlevU) meta."""
    import scipy.sparse as sp
    m = len(dinv)
    Li, Lj, Lv = L
    Ui, Uj, Uv = U
    Lt = sp.csr_matrix((Lv, Lj, Li), shape=(m, m)).T.tocsr()  # strict upper
    Ut = sp.csr_matrix((Uv, Uj, Ui), shape=(m, m)).T.tocsr()  # strict lower
    levUt, nlevUt = levels_from_csr(Ut.indptr, Ut.indices, lower=True)
    levLt, nlevLt = levels_from_csr(Lt.indptr, Lt.indices, lower=False)
    # invariance check; pad with empty (all-sentinel) levels if ever violated
    levL, nlevL = levels_from_csr(Li, Lj, lower=True)
    levU, nlevU = levels_from_csr(Ui, Uj, lower=False)
    tabUt = build_level_table(levUt, max(nlevUt, nlevU), m)
    tabLt = build_level_table(levLt, max(nlevLt, nlevL), m)
    Utd, Utx = ell_of_csr(Ut.indptr, Ut.indices, Ut.data, m)
    Ltd, Ltx = ell_of_csr(Lt.indptr, Lt.indices, Lt.data, m)
    return {
        "Utd": jnp.asarray(Utd), "Utx": jnp.asarray(Utx),
        "Ltd": jnp.asarray(Ltd), "Ltx": jnp.asarray(Ltx),
        "tabUt": jnp.asarray(tabUt), "tabLt": jnp.asarray(tabLt),
    }


def trisolve_transpose_apply(data, b, m, nlevL, nlevU):
    """x = (I+L)^{-T} (D+U)^{-T} b, level by level on device. Requires the
    make_transpose_tables entries in `data`; nlevL/nlevU are the same static
    level counts as the forward solve (see make_transpose_tables)."""
    Utd, Utx, Ltd, Ltx = data["Utd"], data["Utx"], data["Ltd"], data["Ltx"]
    tabUt, tabLt, dinv = data["tabUt"], data["tabLt"], data["dinv"]
    bl = b[:m]

    def fwd(l, z):           # (D + strictU^T) z = b
        rows = tabUt[l]
        rr = jnp.minimum(rows, m - 1)
        contrib = jnp.sum(Utd[rr] * z[Utx[rr]], axis=1)
        return z.at[rows].set((bl[rr] - contrib) * dinv[rr], mode="drop")

    z = lax.fori_loop(0, tabUt.shape[0], fwd, jnp.zeros_like(bl))

    def bwd(l, x):           # (I + strictL^T) x = z
        rows = tabLt[l]
        rr = jnp.minimum(rows, m - 1)
        contrib = jnp.sum(Ltd[rr] * x[Ltx[rr]], axis=1)
        return x.at[rows].set(z[rr] - contrib, mode="drop")

    x = lax.fori_loop(0, tabLt.shape[0], bwd, jnp.zeros_like(bl))
    if b.shape[0] > m:
        x = jnp.pad(x, (0, b.shape[0] - m))
    return x
