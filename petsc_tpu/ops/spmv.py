"""Sparse matrix-vector kernels (pure device functions).

TPU-native equivalents of MatMult_SeqAIJ (reference
src/mat/impls/aij/seq/aij.c:1444) and the cuSPARSE device SpMV
(src/mat/impls/aij/seq/seqcusparse/aijcusparse.cu). Two layouts:

* ELL (padded rows): data/idx of shape (m, K). The natural TPU layout —
  PETSc's MATSELL (sliced ELLPACK, src/mat/impls/sell/seq/sell.h:45) made
  uniform so shapes are static. SpMV = gather + row-sum, vectorizes on the
  VPU; padding entries have data 0 / idx 0 so padded rows produce zeros
  (preserving the framework's zero-tail invariant).

* CSR via segment-sum: for very skewed row lengths where ELL padding would
  blow up memory; nnz-length arrays with a precomputed row-id vector.

All functions take and return raw jnp arrays; Mat objects bind them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ell_spmv(data, idx, x):
    """y = A x for ELL storage: y[i] = sum_k data[i,k] * x[idx[i,k]]."""
    return jnp.sum(data * x[idx], axis=1)


def ell_spmv_add(data, idx, x, y):
    return y + jnp.sum(data * x[idx], axis=1)


def ell_spmv_t(data, idx, x, n):
    """y = A^T x via scatter-add (padding rows contribute 0 to idx 0)."""
    contrib = data * x[:, None]
    return jnp.zeros((n,), dtype=x.dtype).at[idx.reshape(-1)].add(contrib.reshape(-1))


def ell_spmm(data, idx, X):
    """Y = A X for multi-RHS X of shape (n, k): the TP-ish batched solve path."""
    return jnp.sum(data[:, :, None] * X[idx], axis=1)


def csr_seg_spmv(row_ids, col_idx, vals, x, m):
    """y = A x for COO-ish storage (row_ids precomputed from indptr)."""
    return jax.ops.segment_sum(vals * x[col_idx], row_ids, num_segments=m)


def csr_seg_spmv_t(row_ids, col_idx, vals, x, n):
    return jnp.zeros((n,), dtype=x.dtype).at[col_idx].add(vals * x[row_ids])


def dia_spmv(data, offsets, x, m, lpad, rpad):
    """y = A x for DIA (diagonal) storage: y[i] = sum_k data[k,i] * x[i+off_k].

    The TPU-native sparse layout for structured/banded operators (every DMDA
    stencil matrix, reference src/dm/impls/da/fdda.c, is banded with a few
    dozen distinct offsets): each diagonal is a contiguous stream, so SpMV is
    a sum of shifted multiplies — no gather, pure VPU + HBM streams, ~60x
    faster on TPU than gather-based CSR/ELL SpMV. `offsets` is a static
    tuple, so XLA sees fixed slice starts and fuses all taps."""
    xp = jnp.pad(x, (lpad, rpad))
    acc = jnp.zeros((m,), dtype=x.dtype)
    for k, off in enumerate(offsets):
        acc = acc + data[k] * jax.lax.dynamic_slice(xp, (lpad + off,), (m,))
    return acc


def dia_spmv_t(data, offsets, x, n, m, lpad, rpad):
    """y = A^T x: y[i+off] += data[k,i] * x[i], accumulated in padded space."""
    P = m + lpad + rpad
    acc = jnp.zeros((P,), dtype=x.dtype)
    for k, off in enumerate(offsets):
        c = data[k] * x
        seg = jax.lax.dynamic_slice(acc, (lpad + off,), (m,))
        acc = jax.lax.dynamic_update_slice(acc, seg + c, (lpad + off,))
    return acc[lpad:lpad + n]


def hyb_spmv(dia_data, offsets, sdata, sidx, x, m, lpad, rpad):
    """y = A x for HYB storage: high-occupancy diagonals as DIA streams +
    the residual entries as a narrow gather-ELL spill.

    The TPU answer to near-stencil unstructured matrices (SuiteSparse
    atmosmodd-class, BASELINE config 2): chip probes show every XLA gather
    costs ~3 ns/element regardless of locality (examples/csr_formulations.py
    P1-P5), so the win is routing the bulk of nnz through gather-free
    shifted streams and paying the gather floor only for the leftovers.
    Role model: cuSPARSE HYB (ELL+COO) and PETSc's MATSELL
    (src/mat/impls/sell/seq/sell.c) — re-split for a no-gather machine."""
    y = dia_spmv(dia_data, offsets, x, m, lpad, rpad)
    if sdata is not None:
        y = y + jnp.sum(sdata * x[sidx], axis=1)
    return y


def hyb_spmv_t(dia_data, offsets, sdata, sidx, x, n, m, lpad, rpad):
    y = dia_spmv_t(dia_data, offsets, x, n, m, lpad, rpad)
    if sdata is not None:
        contrib = sdata * x[:, None]
        y = y.at[sidx.reshape(-1)].add(contrib.reshape(-1))
    return y


def coo_scatter_csr(perm, seg_ids, coo_vals, nnz):
    """Numeric COO re-assembly: scatter user-order COO values into CSR value
    order with duplicate summation (MatSetValuesCOO device path, reference
    src/mat/utils/gcreate.c:706 / aijkok device assembly)."""
    return jax.ops.segment_sum(coo_vals[perm], seg_ids, num_segments=nnz)
