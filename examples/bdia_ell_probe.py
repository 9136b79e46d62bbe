"""Chip probe: BDIA-ELL — block-diagonal ELL with lane one-hot select.

The gather-free unstructured SpMV format.  Evidence chain (this round):
  - XLA gathers cost ~3 ns/row regardless of width (pallas_gather_probe,
    onehot_window_probe): any per-nnz gather floors at ~0.3 Gnnz/s.
  - A 128-lane one-hot select costs ~0.26 ns/nnz f32.

Format: column c of a nonzero in row r decomposes as
    c = 128*(r//128 + j) + s,   j = block offset, s = lane.
Group nonzeros by j (the "block diagonal").  For each active j the x
window for every row group g is x2[g + j] — a STATIC slice of the padded
(B,128) x view, no gather.  The lane pick is a one-hot contraction; for
f64 the select runs on the two int32 bit-halves (integer select + sum,
no f64 arithmetic) and only the final multiply-accumulate is f64.

Matrix: csr_formulations.py's m2 banded-random (n=500k, K=16 random cols
within +-1500) — the worst case that defeated DIA extraction.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp


def timed_rate(f, nelem, pairs=((3, 13), (3, 53), (3, 203))):
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
            rate = nelem / per / 1e9
        if t_hi > 4 * t_lo:
            break
    return rate


def make_m2(n=500_000, K=16, band=1500):
    r = np.arange(n, dtype=np.int64)
    cols, vals = [], []
    for k in range(K):
        off = ((r * 1103515245 + 12345 + k * 40503) % (2 * band + 1)) - band
        c = np.clip(r + off, 0, n - 1)
        v = 0.1 + ((r * (3 * k + 7)) % 89) / 89.0
        vals.append(np.where(k == 0, 20.0 + v, -v))
        cols.append(np.where(k == 0, r, c))
    return np.stack(cols, 1).astype(np.int64), np.stack(vals, 1)


def to_bdia_ell(cols, vals):
    """Host conversion: bucket nonzeros by block offset j = c//128 - r//128."""
    m, K = cols.shape
    G = -(-m // 128)
    r = np.arange(m, dtype=np.int64)[:, None]
    j = cols // 128 - r // 128                     # (m, K)
    s = (cols % 128).astype(np.int32)
    js = np.unique(j)
    per = {}
    for jv in js:
        sel = (j == jv)
        cnt = sel.sum(1)
        Kj = int(cnt.max())
        dj = np.zeros((m, Kj))
        sj = np.zeros((m, Kj), np.int32)
        # one-hot free packing: argsort puts the selected first per row
        order = np.argsort(~sel, axis=1, kind="stable")
        vs = np.take_along_axis(vals, order, 1)[:, :Kj]
        ss = np.take_along_axis(s, order, 1)[:, :Kj]
        msel = np.take_along_axis(sel, order, 1)[:, :Kj]
        dj = np.where(msel, vs, 0.0)
        sj = np.where(msel, ss, 0).astype(np.int32)
        per[int(jv)] = (dj, sj)
    pad = sum(d.size for d, _ in per.values())
    print(f"  BDIA-ELL: {len(per)} block diagonals, padded slots {pad} "
          f"for nnz {m*K} (fill {m*K/pad:.2f})", flush=True)
    return per, G


def bind(per, G, m, dt):
    """Build the jitted apply."""
    joffs = sorted(per)
    jmin, jmax = joffs[0], joffs[-1]
    datas = [jnp.asarray(per[j][0][:, :], dtype=dt) for j in joffs]
    lanes = [jnp.asarray(per[j][1]) for j in joffs]
    # pad each (m, Kj) to (G*128, Kj)
    datas = [jnp.pad(d, ((0, G * 128 - m), (0, 0))) for d in datas]
    lanes = [jnp.pad(l, ((0, G * 128 - m), (0, 0))) for l in lanes]
    is64 = np.dtype(dt).itemsize == 8

    def apply(x):
        x2 = jnp.pad(x, (0, G * 128 - m)).reshape(G, 128)
        xp = jnp.pad(x2, ((-jmin, jmax), (0, 0)))
        y = jnp.zeros((G * 128,), dt)
        for j, d, l in zip(joffs, datas, lanes):
            V = jax.lax.dynamic_slice_in_dim(xp, j - jmin, G, 0)  # (G,128)
            Kj = l.shape[1]
            lg = l.reshape(G, 128, Kj)
            oh = (lg[..., None] == jax.lax.broadcasted_iota(
                jnp.int32, (G, 128, Kj, 128), 3))
            if is64:
                bits = jax.lax.bitcast_convert_type(V, jnp.int32)  # (G,128,2)
                selb = jnp.sum(
                    jnp.where(oh[..., None], bits[:, None, None, :, :], 0),
                    axis=3)                                # (G,128,Kj,2)
                sel = jax.lax.bitcast_convert_type(selb, jnp.float64)
            else:
                sel = jnp.sum(jnp.where(oh, V[:, None, None, :], 0), axis=3)
            y = y + jnp.sum(d.reshape(G, 128, Kj) * sel,
                            axis=2).reshape(-1)
        return y[:m]
    return apply


def main():
    import petsc_tpu as pt
    pt.init(args=[])
    cols, vals = make_m2()
    m, K = cols.shape
    per, G = to_bdia_ell(cols, vals)
    xh = 0.5 + (np.arange(m) % 1000) / 1000.0
    yref = np.sum(vals * xh[cols], axis=1)
    for dt in (jnp.float32, jnp.float64):
        try:
            f = bind(per, G, m, dt)
            x = jnp.asarray(xh, dtype=dt)
            y = np.asarray(jax.device_get(f(x)))
            err = np.max(np.abs(y - yref)) / np.max(np.abs(yref))
            tol = 1e-5 if dt == jnp.float32 else 1e-13
            assert err < tol, err
            print(f"  correctness ok ({np.dtype(dt).name}, err {err:.2e})",
                  flush=True)

            def loop(x, K_):
                def body(i, v):
                    y = f(v)
                    return v * 0.5 + jnp.zeros_like(v).at[0].set(
                        jnp.sum(y) * 1e-12) + 0.5
                return jnp.sum(jax.lax.fori_loop(0, K_, body, x))
            jf = jax.jit(loop)
            r = timed_rate(lambda K_: jf(x, K_), m * K)
            print(f"BDIA-ELL {np.dtype(dt).name}: {r:8.3f} Gnnz/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{np.dtype(dt).name}: FAILED "
                  f"({type(e).__name__}: {str(e)[:200]})", flush=True)


if __name__ == "__main__":
    main()
