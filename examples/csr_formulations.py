"""Chip experiment: unstructured-CSR SpMV formulations (round-3 VERDICT
item 3 — "an unstructured SpMV that isn't the 0.13 Gnnz/s gather trap").

The reference's role models are MatMult_SeqAIJ (reference
src/mat/impls/aij/seq/aij.c:1444) and the cuSPARSE CSR SpMV
(src/mat/impls/aij/seq/seqcusparse/aijcusparse.cu).  A TPU has no
hardware gather, so the CSR/ELL x[idx] read is the whole design problem.

Phases (each run in its own process — an OOM poisons the device state):

  probes  primitive floors: random/sorted x[perm] gather, scatter-add,
          lane-form take_along_axis, VMEM-resident small-table gather —
          the hard ceiling any gather-based formulation can reach.
  m1      atmosmodd-class matrix (BASELINE config 2): 7-pt stencil on a
          239x239x22 grid (n=1.26M, nnz ~8.7M), variable coefficients,
          presented as GENERIC ELL — no structure hint reaches the
          kernel.  E3 (DIA extraction) should recover streaming rate.
  m2      banded-random: n=500k, K=16 random columns within a +-1500
          band — the RCM'd 3-D FE stand-in (no extractable diagonals).

Formulations:
  E0  gather-ELL (round-2 production fallback): y = sum(data*x[idx], 1)
  E1  two-level gather, chunked: x viewed as (B, L) lane blocks; gather
      whole blocks by idx//L (aligned vreg moves) then take_along_axis
      on the lane dim (idx%L); rows processed in lax.map chunks so the
      (chunk, K, L) intermediate stays ~tens of MB.
  E2  scatter CSC-ELL: zeros.at[idx].add(data * x[:, None]) — gather-free
      dual (broadcast x, scatter y) = A^T x with the same arrays.
  E3  DIA extraction: high-occupancy diagonals become shifted streams
      (ops/spmv.dia_spmv); the remainder spills to E0.

Methodology identical to stencil_formulations.py: K-differenced jitted
fori_loop, best-of-3, correctness cross-checked on device against E0.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed_rate(f, nnz, pairs=((3, 13), (3, 53), (3, 203))):
    def timed(K):
        float(f(np.int32(K)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(np.int32(K)))
            best = min(best, time.perf_counter() - t0)
        return best

    rate = 0.0
    for lo, hi in pairs:
        t_lo, t_hi = timed(lo), timed(hi)
        per = (t_hi - t_lo) / (hi - lo)
        if per > 0 and t_hi > 1.5 * t_lo:
            rate = nnz / per / 1e9
        if t_hi > 4 * t_lo:
            break
    return rate


# ---------------------------------------------------------------- matrices

def make_atmos(dtype):
    """7-pt variable-coefficient stencil as generic ELL, built on device."""
    nz, ny, nx = 22, 239, 239
    n = nz * ny * nx
    r = jnp.arange(n, dtype=jnp.int32)
    z, rem = r // (ny * nx), r % (ny * nx)
    y, x = rem // nx, rem % nx
    cols, vals = [], []
    for k, (dz, dy, dx) in enumerate(
            [(0, 0, 0), (0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0),
             (-1, 0, 0), (1, 0, 0)]):
        ok = ((z + dz >= 0) & (z + dz < nz) & (y + dy >= 0) & (y + dy < ny)
              & (x + dx >= 0) & (x + dx < nx))
        c = jnp.where(ok, r + jnp.int32(dz * ny * nx + dy * nx + dx), 0)
        v = 0.1 + ((r * (2 * k + 3)) % 97).astype(dtype) / 97.0
        v = jnp.where(k == 0, 6.5 + v, -v)
        vals.append(jnp.where(ok, v, jnp.zeros((), dtype)))
        cols.append(c)
    idx = jnp.stack(cols, 1)
    data = jnp.stack(vals, 1)
    nnz = int(jnp.sum(data != 0))
    return n, idx, data, nnz


def make_banded(dtype, n=500_000, K=16, band=1500):
    r = jnp.arange(n, dtype=jnp.int32)
    cols, vals = [], []
    for k in range(K):
        off = ((r * 1103515245 + 12345 + k * 40503) % (2 * band + 1)) - band
        c = jnp.clip(r + off.astype(jnp.int32), 0, n - 1)
        v = 0.1 + ((r * (3 * k + 7)) % 89).astype(dtype) / 89.0
        vals.append(jnp.where(k == 0, 20.0 + v, -v))
        cols.append(jnp.where(k == 0, r, c))
    return n, jnp.stack(cols, 1), jnp.stack(vals, 1), n * K


# ------------------------------------------------------------ formulations

def e0_gather(data, idx, x):
    return jnp.sum(data * x[idx], axis=1)


def make_e1(L, rows_per_chunk=8192):
    def e1(data, idx, x):
        m, K = idx.shape
        n = x.shape[0]
        B = -(-n // L)
        x2 = jnp.pad(x, (0, B * L - n)).reshape(B, L)
        C = rows_per_chunk
        nchunk = -(-m // C)
        pad = nchunk * C - m
        dp = jnp.pad(data, ((0, pad), (0, 0))).reshape(nchunk, C, K)
        ip = jnp.pad(idx, ((0, pad), (0, 0))).reshape(nchunk, C, K)

        def chunk(args):
            d, i = args
            rows = x2[i // L]                       # (C, K, L) block gather
            g = jnp.take_along_axis(rows, (i % L)[..., None], axis=2)[..., 0]
            return jnp.sum(d * g, axis=1)

        y = jax.lax.map(chunk, (dp, ip)).reshape(-1)
        return y[:m]
    return e1


def e2_scatter(data, idx, x):
    n = x.shape[0]
    contrib = data * x[:, None]
    return jnp.zeros((n,), x.dtype).at[idx.reshape(-1)].add(
        contrib.reshape(-1))


def dia_extract(idx_np, data_np, n, min_occ=0.2):
    """Host analysis: split ELL entries into DIA streams + spill ELL."""
    m, K = idx_np.shape
    rows = np.repeat(np.arange(m, dtype=np.int64)[:, None], K, 1)
    live = data_np != 0
    offs = idx_np.astype(np.int64) - rows
    u, counts = np.unique(offs[live], return_counts=True)
    keep = u[counts >= min_occ * n]
    dia = np.zeros((len(keep), n), data_np.dtype)
    spill_mask = live.copy()
    for j, off in enumerate(keep):
        sel = live & (offs == off)
        dia[j, rows[sel]] = data_np[sel]
        spill_mask &= ~sel
    Ks = int(spill_mask.sum(1).max()) if spill_mask.any() else 0
    sidx = np.zeros((m, max(Ks, 1)), np.int32)
    sdat = np.zeros((m, max(Ks, 1)), data_np.dtype)
    for i in np.nonzero(spill_mask.any(1))[0]:
        c = np.nonzero(spill_mask[i])[0]
        sidx[i, :len(c)] = idx_np[i, c]
        sdat[i, :len(c)] = data_np[i, c]
    return [int(o) for o in keep], dia, sidx, sdat, Ks


def make_e3(offsets, dia, sidx, sdat, has_spill):
    from petsc_tpu.ops.spmv import dia_spmv
    lpad = max(0, -min(offsets)) if offsets else 0
    rpad = max(0, max(offsets)) if offsets else 0

    def e3(x):
        n = x.shape[0]
        y = dia_spmv(dia, tuple(offsets), x, n, lpad, rpad)
        if has_spill:
            y = y + jnp.sum(sdat * x[sidx], axis=1)
        return y
    return e3


# --------------------------------------------------------------- phases

def bench_matrix(mname, make, dt, with_dia):
    n, idx, data, nnz = make(dt)
    x = (0.5 + (jnp.arange(n) % 1000) / 1000.0).astype(dt)
    y0 = e0_gather(data, idx, x)

    cands = [("E0 gather-ELL      ", e0_gather),
             ("E2 scatter CSC-ELL ", e2_scatter),
             ("E1 two-level L=32  ", make_e1(32)),
             ("E1 two-level L=128 ", make_e1(128))]

    for name, f in cands:
        try:
            if not name.startswith("E2"):
                err = float(jnp.max(jnp.abs(f(data, idx, x) - y0))
                            / jnp.max(jnp.abs(y0)))
                assert err < 1e-12, (mname, name, err)

            def loop(data, idx, x, K, f=f):
                return jnp.sum(jax.lax.fori_loop(
                    0, K, lambda i, v: f(data, idx, v) * 1e-2 + 1.0, x))
            jf = jax.jit(loop)
            r = timed_rate(lambda K: jf(data, idx, x, K), nnz)
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"{mname} {name}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:100]})", flush=True)
            continue
        print(f"{mname} {name}: {r:8.3f} Gnnz/s", flush=True)

    if not with_dia:
        return
    idx_np = np.asarray(jax.device_get(idx))
    data_np = np.asarray(jax.device_get(data))
    offsets, dia_np, sidx, sdat, Ks = dia_extract(idx_np, data_np, n)
    print(f"{mname}: DIA extraction -> {len(offsets)} diagonals, "
          f"spill K={Ks}", flush=True)
    if not offsets:
        return
    f3 = make_e3(offsets, jnp.asarray(dia_np), jnp.asarray(sidx),
                 jnp.asarray(sdat), Ks > 0)
    err = float(jnp.max(jnp.abs(f3(x) - y0)) / jnp.max(jnp.abs(y0)))
    assert err < 1e-12, (mname, "E3", err)

    def loop3(x, K):
        return jnp.sum(jax.lax.fori_loop(
            0, K, lambda i, v: f3(v) * 1e-2 + 1.0, x))
    jf3 = jax.jit(loop3)
    r = timed_rate(lambda K: jf3(x, K), nnz)
    print(f"{mname} E3 DIA+spill       : {r:8.3f} Gnnz/s", flush=True)


def phase_probes():
    m, nsmall = 8_388_608, 1_048_576
    rng = np.random.default_rng(0)
    perm_r = jnp.asarray(rng.integers(0, nsmall, m, dtype=np.int32))
    perm_s = jnp.sort(perm_r)

    for dt in (jnp.float64, jnp.float32):
        xs = (0.5 + (jnp.arange(nsmall) % 1000) / 1000.0).astype(dt)
        dn = np.dtype(dt).name
        for pname, g in ((f"P1 gather random  {dn}", perm_r),
                         (f"P2 gather sorted  {dn}", perm_s)):
            def gloop(v, g, K):
                def body(i, v):
                    z = v[g]
                    return v * 0.5 + jnp.zeros_like(v).at[0].set(
                        jnp.sum(z) * 1e-12) + 0.5
                return jnp.sum(jax.lax.fori_loop(0, K, body, v))
            jg = jax.jit(gloop)
            r = timed_rate(lambda K: jg(xs, g, K), m)
            print(f"{pname}: {r:8.3f} Gelem/s", flush=True)

        vals = xs[perm_r]

        def sloop(vals, g, K):
            def body(i, c):
                y = jnp.zeros((nsmall,), vals.dtype).at[g].add(vals + c)
                return y[0] * 1e-12
            return jax.lax.fori_loop(0, K, body, jnp.zeros((), dt))
        js = jax.jit(sloop)
        r = timed_rate(lambda K: js(vals, perm_r, K), m)
        print(f"P3 scatter-add     {dn}: {r:8.3f} Gelem/s", flush=True)

        # P4 lane-form: one take_along_axis select per 128-wide row
        a = 1_048_576
        V = jnp.broadcast_to(xs[:128], (a, 128)).astype(dt)
        lanes = jnp.asarray(rng.integers(0, 128, (a, 1), dtype=np.int32))

        def lloop(V, lanes, K):
            def body(i, c):
                z = jnp.take_along_axis(
                    V + c, lanes, axis=1)
                return jnp.sum(z) * 1e-12
            return jax.lax.fori_loop(0, K, body, jnp.zeros((), dt))
        jl = jax.jit(lloop)
        r = timed_rate(lambda K: jl(V, lanes, K), a)
        print(f"P4 lane-select     {dn}: {r:8.3f} Gelem/s "
              f"(touches 128x the elements)", flush=True)

        # P5 small-table gather (table VMEM-resident)
        tab = xs[:16384]
        gsm = jnp.asarray(rng.integers(0, 16384, m, dtype=np.int32))

        def vloop(t, g, K):
            def body(i, v):
                z = t[g] + v
                return z * 0.0 + t
            return jnp.sum(jax.lax.fori_loop(0, K, body, t)) + 0 * g[0]
        # keep the gather live: accumulate its sum into the carry
        def vloop2(t, g, K):
            def body(i, t):
                z = t[g]
                return t * 0.5 + jnp.zeros_like(t).at[0].set(
                    jnp.sum(z) * 1e-12) + 0.5
            return jnp.sum(jax.lax.fori_loop(0, K, body, t))
        jv = jax.jit(vloop2)
        r = timed_rate(lambda K: jv(tab, gsm, K), m)
        print(f"P5 gather 16k-table{dn}: {r:8.3f} Gelem/s", flush=True)


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else None
    if phase is None:
        for p in ("probes", "m1", "m2"):
            print(f"--- phase {p} ---", flush=True)
            subprocess.run([sys.executable, os.path.abspath(__file__), p],
                           check=False)
        return
    import petsc_tpu as pt
    pt.init(args=[])
    if phase == "probes":
        phase_probes()
    elif phase == "m1":
        bench_matrix("M1 atmos ", make_atmos, jnp.float64, True)
    elif phase == "m2":
        bench_matrix("M2 banded", make_banded, jnp.float64, False)


if __name__ == "__main__":
    main()
