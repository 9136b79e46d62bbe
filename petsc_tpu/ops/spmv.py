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
    """y = A^T x: y[i+off] += data[k,i] * x[i], accumulated in padded space.

    The accumulator must cover every write window lpad+off .. lpad+off+m
    AND the output window lpad .. lpad+n; for a rectangular A with n > m
    the largest offset exceeds rpad (rpad only pads past column n), so a
    buffer sized m+lpad+rpad lets dynamic_update_slice silently CLAMP the
    start and corrupt the result (ADVICE r3, medium)."""
    maxoff = max([0] + [int(o) for o in offsets])
    P = lpad + max(m + rpad, maxoff + m, n)
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
    (src/mat/impls/sell/seq/sell.c) — re-split for a no-gather machine.

    The spill is COMPACTED COO (srows/sidx/sdata of length nnz_spill):
    gathers cost ~3 ns/element no matter what, so the spill must touch
    only rows that actually spill, not all m (chip-measured 6x)."""
    y = dia_spmv(dia_data, offsets, x, m, lpad, rpad)
    if sdata is not None:
        # direct compacted-COO scatter-add. A sorted-segment_sum variant
        # (reduce to unique rows, then one small scatter) was chip-
        # measured at HALF this path's rate in round 5 — XLA lowers the
        # segment reduction to a scatter anyway, so it just added a pass
        srows, scols = sidx[0], sidx[1]
        y = y.at[srows].add(sdata * x[scols])
    return y


def hyb_spmv_t(dia_data, offsets, sdata, sidx, x, n, m, lpad, rpad):
    y = dia_spmv_t(dia_data, offsets, x, n, m, lpad, rpad)
    if sdata is not None:
        srows, scols = sidx[0], sidx[1]
        y = y.at[scols].add(sdata * x[srows])
    return y


def _onehot_select(V, lanes):
    """sel[..., k] = V[..., lanes[..., k]] with NO gather: a 128-wide
    one-hot contraction per pick.  V is (..., 128) float; lanes (..., K)
    int32.  Exactly one term of the masked sum is nonzero, so the sum IS
    the selected value bit-exactly in every dtype (adding zeros is exact
    in IEEE).  Two rejected f64 variants for the record: int32
    bit-half selects via bitcast_convert (XLA's TPU x64-rewrite pass
    rejects the HLO, ADVICE r3) and a 3-way f32 Dekker split (round 5:
    chip-measured within tunnel variance of the direct f64 path AND
    silently zeroes values below the f32 subnormal range — reverted;
    the direct path is exact for every f64 value).  Chip basis: selects
    cost ~0.26 ns f32 vs ~27 ns for an XLA element gather
    (examples/pallas_gather_probe.py, onehot_window_probe.py)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, lanes.shape + (128,),
                                    lanes.ndim)
    oh = lanes[..., None] == iota                       # (..., K, 128)
    return jnp.sum(jnp.where(oh, V[..., None, :], jnp.zeros((), V.dtype)),
                   axis=-1)


def bdia_spmv(joffs, jmin, jmax, data, lanes, spill, x, m):
    """y = A x for BDIA-ELL storage — the gather-free unstructured layout.

    Columns decompose as c = 128*(r//128 + j) + s.  Nonzeros are bucketed
    by block offset j; for each active j the x window of every 128-row
    group is a STATIC slice of the padded (B, 128) x view (a roll, not a
    gather) and the lane pick is a one-hot select (_onehot_select).  A
    lax.scan over the stacked j-buckets keeps the HLO size constant.

    joffs: (J,) int32 block offsets; jmin/jmax: python ints with
    jmin <= 0 <= jmax (binder clamps); data/lanes: (J, G*128, Kcap)
    values / lane ids (padded entries have data 0);
    spill: None or (srows, scols, svals) COO for entries past Kcap.

    TPU role model: MATSELL / cuSPARSE HYB re-derived for a machine with
    no hardware gather (reference src/mat/impls/sell/seq/sell.c)."""
    G = data.shape[1] // 128
    x2 = jnp.pad(x[:m], (0, G * 128 - m)).reshape(G, 128)
    xp = jnp.pad(x2, ((-jmin, jmax), (0, 0)))

    def step(y, args):
        j, d, l = args
        V = jax.lax.dynamic_slice(
            xp, (j - jmin, jnp.int32(0)), (G, 128))        # (G, 128)
        sel = _onehot_select(V[:, None, :], l.reshape(G, 128, -1))
        return y + jnp.sum(d.reshape(G, 128, -1) * sel, axis=2), None

    y, _ = jax.lax.scan(step, jnp.zeros((G, 128), x.dtype),
                        (joffs, data, lanes))
    y = y.reshape(-1)[:m]
    if spill is not None:
        srows, scols, svals = spill
        y = y.at[srows].add(svals * x[scols])
    if x.shape[0] > m:
        y = jnp.pad(y, (0, x.shape[0] - m))
    return y


def bdia_spmv_t(joffs, jmin, jmax, data, lanes, spill, x, m, n):
    """y = A^T x: each bucket scatters its block back by +j with the lane
    pick inverted.  The inversion is a per-group scatter-add over lane ids
    (different entries may land on one lane, so the reduction runs in the
    value dtype); an earlier one-hot formulation materialised a
    (G,128,K,128) tensor — multi-GB at the sizes bdia targets — so the
    transpose pays the XLA scatter cost instead (ADVICE r3, low; the
    transpose is never the hot path)."""
    G = data.shape[1] // 128
    x2 = jnp.pad(x[:m], (0, G * 128 - m)).reshape(G, 128)
    P = G + jmax - jmin
    gidx = jnp.repeat(jnp.arange(G, dtype=jnp.int32), 128 * data.shape[2])

    def step(acc, args):
        j, d, l = args
        w = (d.reshape(G, 128, -1) * x2[:, :, None]).reshape(-1)
        contrib = jnp.zeros((G, 128), x.dtype).at[gidx, l.reshape(-1)].add(w)
        seg = jax.lax.dynamic_slice(acc, (j - jmin, jnp.int32(0)), (G, 128))
        return jax.lax.dynamic_update_slice(
            acc, seg + contrib, (j - jmin, jnp.int32(0))), None

    acc, _ = jax.lax.scan(step, jnp.zeros((P, 128), x.dtype),
                          (joffs, data, lanes))
    y = acc[-jmin:-jmin + G].reshape(-1)[:n]
    if spill is not None:
        srows, scols, svals = spill
        y = y.at[scols].add(svals * x[srows])
    if x.shape[0] > n:
        y = jnp.pad(y, (0, x.shape[0] - n))
    return y


def coo_scatter_csr(perm, seg_ids, coo_vals, nnz):
    """Numeric COO re-assembly: scatter user-order COO values into CSR value
    order with duplicate summation (MatSetValuesCOO device path, reference
    src/mat/utils/gcreate.c:706 / aijkok device assembly)."""
    return jax.ops.segment_sum(coo_vals[perm], seg_ids, num_segments=nnz)
