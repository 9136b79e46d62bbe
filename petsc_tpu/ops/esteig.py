"""On-device eigenvalue-bound estimation (the esteig role).

Behavioral reference: cheby.c:74-115 — KSPChebyshevEstEig runs a 10-step
estimation KSP on B^-1 A with a noisy RHS and extracts extreme Ritz
values (KSPComputeExtremeSingularValues). TPU redesign: the whole Arnoldi
sweep is ONE compiled device program (classical Gram-Schmidt with
reorthogonalization so every inner product is a full-width masked matmul
— no sequential MGS, no per-matvec host round trips); only the tiny
(m x m) Hessenberg eigenproblem runs on host. Compiled programs are
cached per operator meta, matching the framework's jit-per-meta contract.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .reduce import fgemv, fgemvT

from . import operator

_prog_cache: dict = {}


def _arnoldi_prog(A_meta, n, m, seed):
    def prog(data):
        op = operator.bind(A_meta, data)
        d = op.diag()
        dinv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)
        key = jax.random.PRNGKey(seed)
        v0 = jax.random.uniform(key, (n,), dtype=d.dtype) - 0.5
        V = jnp.zeros((m + 1, n), dtype=d.dtype).at[0].set(
            v0 / jnp.linalg.norm(v0))
        H = jnp.zeros((m + 1, m), dtype=d.dtype)

        def body(j, carry):
            V, H = carry
            w = dinv * op.mult(V[j])
            mask = (jnp.arange(m + 1) <= j).astype(w.dtype)
            # CGS2: two rounds of classical Gram-Schmidt (full-width
            # masked matvecs; numerically ~MGS for Ritz-bound purposes)
            h1 = mask * fgemv(V, w)
            w = w - fgemvT(h1, V)
            h2 = mask * fgemv(V, w)
            w = w - fgemvT(h2, V)
            beta = jnp.linalg.norm(w)
            h = h1 + h2
            H = jax.lax.dynamic_update_slice(H, h[:, None], (0, j))
            H = H.at[j + 1, j].set(beta)
            safe = jnp.where(beta > 1e-30, beta, 1.0)
            V = V.at[j + 1].set(jnp.where(beta > 1e-30, w / safe, 0.0))
            return V, H

        _, H = jax.lax.fori_loop(0, m, body, (V, H))
        return H

    return jax.jit(prog)


def eig_bounds_device(A_meta, A_data, n, iters=10, seed=7):
    """(emin, emax) Ritz estimates of D^-1 A; matvecs and
    orthogonalization run in one compiled program on device."""
    m = int(min(iters, n))
    key = (A_meta, n, m, seed)
    if key not in _prog_cache:
        _prog_cache[key] = _arnoldi_prog(A_meta, n, m, seed)
    H = np.asarray(_prog_cache[key](A_data))
    # breakdown: truncate at the first tiny subdiagonal
    sub = np.abs(np.diag(H[1:, :], 0))
    cut = np.nonzero(sub < 1e-14)[0]
    mm = int(cut[0]) + 1 if len(cut) else m
    ritz = np.linalg.eigvals(H[:mm, :mm]).real
    ritz = ritz[ritz > 0] if (ritz > 0).any() else np.abs(ritz)
    return max(float(ritz.min()), 1e-12), max(float(ritz.max()), 1e-12)
