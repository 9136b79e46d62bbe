"""MatFFT and MatKAIJ wrapper formats.

References: src/mat/impls/fft (MATFFT — spectral operator; cufft/fftw
backends become jnp.fft on TPU) and src/mat/impls/kaij (MATKAIJ:
I (x) S + T (x) I interpolated multi-dof operator used by TS multistage)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import config
from ..ops import operator
from .utility import _WrapperMat


class MatFFT(_WrapperMat):
    """DFT operator: y = fft(x) (normalized like FFTW 'backward': plain
    fft forward, mult_t = inverse * n)."""

    @classmethod
    def create(cls, n, comm=None):
        M = cls(comm)
        M.setSizes((int(n), int(n)))
        M._meta_v = ("mat_fft", int(n))
        M._data_v = {}
        return M


def _bind_fft(meta, data):
    n = meta[1]
    return operator.Op(mult=lambda x: jnp.fft.fft(x[:n]),
                       mult_t=lambda y: jnp.fft.ifft(y[:n]) * n)


class MatKAIJ(_WrapperMat):
    """K = I_n (x) S + A (x) T with A sparse (n x n) and S, T small dense
    (p x p) (kaij.h). Vector layout: n blocks of p."""

    @classmethod
    def create(cls, A, S=None, T=None, comm=None):
        M = cls(comm or A.comm)
        n = A.getSize()[0]
        p = (S if S is not None else T).shape[0]
        M.setSizes((n * p, n * p))
        rd = config.real_dtype()
        M._meta_v = ("mat_kaij", A.meta, int(n), int(p),
                     S is not None, T is not None)
        M._data_v = {
            "A": A.device_data(),
            "S": jnp.asarray(np.asarray(S), dtype=rd) if S is not None
            else jnp.zeros(()),
            "T": jnp.asarray(np.asarray(T), dtype=rd) if T is not None
            else jnp.zeros(()),
        }
        return M


def _bind_kaij(meta, data):
    _, A_meta, n, p, has_s, has_t = meta
    Aop = operator.bind(A_meta, data["A"])

    def mult(x):
        X = x[: n * p].reshape(n, p)
        out = jnp.zeros_like(X)
        if has_s:
            out = out + X @ data["S"].T
        if has_t:
            AX = jnp.stack([Aop.mult(X[:, j]) for j in range(p)], axis=1)
            out = out + AX @ data["T"].T
        return out.reshape(-1)

    return operator.Op(mult=mult)


operator.register_binder("mat_fft", _bind_fft)
operator.register_binder("mat_kaij", _bind_kaij)
