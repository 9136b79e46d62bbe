"""Ensemble data assimilation: LETKF local analysis.

Behavioral reference: src/ml/da (PetscDA ensemble Kalman;
impls/ensemble/letkf/kokkos/letkf_local_analysis.kokkos.cxx — per-gridpoint
local analysis batched on device). TPU design: the per-point local
analysis (k x k eigendecomposition, k = ensemble size) is vmapped — a
batched symmetric eig on the MXU-friendly small-matrix path, the exact
role of the reference's Kokkos kernel.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def letkf_analysis(Xf, yo, H, R_diag, inflation=1.0, localization=None):
    """One LETKF analysis step.

    Xf: (n, k) forecast ensemble (state dim n, ensemble size k)
    yo: (m,) observations
    H:  (m, n) observation operator (dense or callable x->Hx rows)
    R_diag: (m,) observation error variances
    localization: optional (n, m) weights rho_ij in [0,1] tapering each
      observation's influence on each state point (Gaspari-Cohn style);
      None = global ETKF per point with full obs set.

    Returns Xa: (n, k) analysis ensemble.
    """
    Xf = jnp.asarray(Xf)
    yo = jnp.asarray(yo)
    R_diag = jnp.asarray(R_diag)
    n, k = Xf.shape
    xbar = Xf.mean(axis=1, keepdims=True)
    Xp = Xf - xbar                       # perturbations (n, k)
    if callable(H):
        Yf = jax.vmap(H, in_axes=1, out_axes=1)(Xf)
    else:
        Yf = jnp.asarray(H) @ Xf         # (m, k)
    ybar = Yf.mean(axis=1, keepdims=True)
    Yp = Yf - ybar                       # (m, k)
    d = yo - ybar[:, 0]                  # innovation (m,)

    def local_analysis(rho_row):
        """ETKF weights for one state point given obs weights rho (m,)."""
        w_obs = rho_row / R_diag          # tapered R^-1 (m,)
        C = Yp.T * w_obs                  # (k, m)
        Pa_inv = (k - 1) / inflation * jnp.eye(k) + C @ Yp
        evals, evecs = jnp.linalg.eigh(Pa_inv)
        evals = jnp.maximum(evals, 1e-12)
        Pa = (evecs / evals) @ evecs.T
        Wa = (evecs / jnp.sqrt(evals)) @ evecs.T * jnp.sqrt(k - 1.0)
        wbar = Pa @ (C @ d)
        return wbar, Wa

    if localization is None:
        rho = jnp.ones((1, len(yo)))
        wbar, Wa = local_analysis(rho[0])
        Xa = xbar + Xp @ (wbar[:, None] + Wa)
        return Xa
    rho = jnp.asarray(localization)      # (n, m)
    wbar_all, Wa_all = jax.vmap(local_analysis)(rho)   # (n,k), (n,k,k)
    incr = jnp.einsum("nk,nk->n", Xp, wbar_all)
    ens = jnp.einsum("nk,nkj->nj", Xp, Wa_all)
    return xbar + incr[:, None] + ens


def gaspari_cohn(r):
    """Gaspari-Cohn 5th-order piecewise localization function of r =
    distance / localization_radius (support 2)."""
    r = np.abs(np.asarray(r, dtype=np.float64))
    w = np.zeros_like(r)
    m1 = r <= 1.0
    m2 = (r > 1.0) & (r < 2.0)
    x = r[m1]
    w[m1] = (((-0.25 * x + 0.5) * x + 0.625) * x - 5.0 / 3.0) * x ** 2 + 1.0
    x = r[m2]
    w[m2] = ((((x / 12.0 - 0.5) * x + 0.625) * x + 5.0 / 3.0) * x
             - 5.0) * x + 4.0 - 2.0 / (3.0 * x)
    return np.clip(w, 0.0, 1.0)
