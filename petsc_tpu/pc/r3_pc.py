"""Round-3 PC implementations: qr, spai, nn.

Behavioral references:
  qr    src/ksp/pc/impls/factor/qr (wraps SuiteSparse SPQR): direct solve
        through a QR factorization — the factor-family member that stays
        well-posed on rank-deficient / least-squares operators.
  spai  src/ksp/pc/impls/spai (wraps the SPAI package, Grote-Huckle):
        sparse approximate inverse minimizing ||A M - I||_F columnwise
        over a fixed sparsity pattern.
  nn    src/ksp/pc/impls/is/nn (PCNN): Neumann-Neumann domain
        decomposition on a MATIS operator — multiplicity-scaled local
        Neumann (pseudo-)solves plus a coarse space of subdomain
        constants.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import config
from ..ops import operator
from ..sys.error import Error
from .pc import PC


class _PCQR:
    """Direct solve via dense column-pivoted QR (factor/qr role). The
    reference reaches sparse QR through SuiteSparse SPQR; here the factor
    is dense LAPACK QR on the host (like the SVD/coarse-LU direct PCs,
    a small-to-medium-system tool) and the apply is a device triangular
    solve. Rank-deficient rows fall back to the pseudo-inverse action
    (R's zero diagonal entries are truncated), which is what makes QR the
    right factor PC for singular operators."""

    def __init__(self, pc):
        self.pc = pc

    def set_from_options(self):
        pass

    def setup(self):
        import scipy.linalg as sla
        A = self.pc.pmat.to_scipy().toarray() \
            if hasattr(self.pc.pmat, "to_scipy") \
            else self.pc.pmat.getDenseArray()
        n = A.shape[0]
        Q, R, piv = sla.qr(A, mode="economic", pivoting=True)
        # truncate numerically-zero diagonal of R (rank deficiency)
        d = np.abs(np.diag(R))
        tol = max(A.shape) * np.finfo(float).eps * (d.max() if len(d) else 1)
        rank = int((d > tol).sum())
        rd = config.real_dtype()
        pad = self.pc.pmat.row_layout.pad
        inv_piv = np.empty(n, dtype=np.int64)
        inv_piv[piv] = np.arange(n)
        data = {"Q": jnp.asarray(np.pad(Q, ((0, pad), (0, 0))), rd),
                "R": jnp.asarray(R[:rank, :rank], rd),
                "piv": jnp.asarray(piv[:rank]),
                "npad": jnp.asarray(n + pad)}
        return ("pc_qr", n, rank, n + pad), data


def _bind_qr(meta, data):
    _, n, rank, npad = meta
    Q, R, piv = data["Q"], data["R"], data["piv"]

    def mult(b):
        y = (Q.T @ b)[:rank]
        z = jax.scipy.linalg.solve_triangular(R, y, lower=False)
        x = jnp.zeros(npad, b.dtype).at[piv].set(z)
        return x

    import jax
    return operator.Op(mult=mult)


import jax  # noqa: E402

operator.register_binder("pc_qr", _bind_qr)
PC.register_impl("qr", _PCQR)


class _PCSPAI:
    """Static-pattern sparse approximate inverse (spai.c role): M with
    the sparsity of A (or of A^2 with -pc_spai_pattern power2) minimizing
    ||A M - I||_F column by column — each column is an independent small
    dense least-squares, solved here batched by pattern size (the same
    batching trick as GAMG's per-aggregate QR). The reference's SPAI
    package grows the pattern adaptively (eps/nbsteps); the static
    variant is the classic Grote-Huckle starting point and is documented
    as such. Apply = one SpMV with M (explicitly assembled, so it rides
    whatever device layout MatAIJ picks)."""

    def __init__(self, pc):
        self.pc = pc
        self.pattern = "same"

    def set_from_options(self):
        t = self.pc.opt("get_string", "pc_spai_pattern", None)
        if t:
            self.pattern = t

    def setup(self):
        import scipy.sparse as sp
        from ..mat.aij import MatAIJ
        A = self.pc.pmat.to_scipy().tocsr()
        n = A.shape[0]
        Pat = A
        if self.pattern in ("power2", "ata"):
            B = A.copy()
            B.data = np.ones_like(B.data)
            Pat = (B @ B).tocsr()
        Ac = A.tocsc()
        Pc = Pat.tocsc()
        rows_l, cols_l, vals_l = [], [], []
        # group columns by pattern size; each group is ONE batched
        # minimum-norm solve (stacked pinv == per-column lstsq: zero
        # rows padded onto a least-squares system change nothing)
        sizes = np.diff(Pc.indptr)
        for sz in np.unique(sizes):
            if sz == 0:
                continue
            cols = np.nonzero(sizes == sz)[0]
            J = Pc.indices[Pc.indptr[cols][:, None] + np.arange(sz)]
            for c0 in range(0, len(cols), 4096):
                cc, JJ = cols[c0:c0 + 4096], J[c0:c0 + 4096]
                r, c, v = self._solve_group(Ac, cc, JJ)
                rows_l.append(r); cols_l.append(c); vals_l.append(v)
        M = sp.csr_matrix((np.concatenate(vals_l),
                           (np.concatenate(rows_l), np.concatenate(cols_l))),
                          shape=(n, n))
        Mm = MatAIJ.from_scipy(M, comm=self.pc.pmat.comm)
        return Mm.meta, Mm.device_data()

    @staticmethod
    def _solve_group(Ac, cols, J):
        """min ||A[:, J_b] m_b - e_{cols[b]}|| for a batch of columns with
        one pattern size, fully vectorized: CSC entries of every A[:, J_b]
        are expanded flat, per-batch touched-row sets deduplicated with a
        lexsort, the dense (B, mi_max, sz) local systems scatter-built,
        and all B minimum-norm solutions come from one stacked pinv."""
        B, sz = J.shape
        st, en = Ac.indptr[J], Ac.indptr[J + 1]
        cnt = (en - st).ravel()                       # entries per (b,slot)
        tot = int(cnt.sum())
        if tot == 0:
            return (J.ravel(), np.repeat(cols, sz),
                    np.zeros(B * sz))
        flat_id = np.repeat(np.arange(B * sz), cnt)
        base = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        pos = np.arange(tot) - np.repeat(base, cnt) + np.repeat(st.ravel(), cnt)
        rows_e, vals_e = Ac.indices[pos], Ac.data[pos]
        bid, slot = flat_id // sz, flat_id % sz
        # per-batch unique touched rows -> local row index
        order = np.lexsort((rows_e, bid))
        bs_, rs_ = bid[order], rows_e[order]
        newrow = np.empty(tot, bool)
        newrow[0] = True
        newrow[1:] = (bs_[1:] != bs_[:-1]) | (rs_[1:] != rs_[:-1])
        uid = np.cumsum(newrow) - 1                   # global unique id
        ub, ur = bs_[newrow], rs_[newrow]             # (nuniq,) owners/rows
        first_uid_of_b = np.searchsorted(ub, np.arange(B))
        lrow_sorted = uid - first_uid_of_b[bs_]
        lrow = np.empty(tot, dtype=np.int64)
        lrow[order] = lrow_sorted
        mi = np.diff(np.append(first_uid_of_b, len(ub)))  # rows per batch
        mi_max = int(mi.max())
        lhs = np.zeros((B, mi_max, sz))
        lhs[bid, lrow, slot] = vals_e
        rhs = np.zeros((B, mi_max))
        hit = ur == cols[ub]                          # unit-vector rows
        rhs[ub[hit], (np.arange(len(ub)) - first_uid_of_b[ub])[hit]] = 1.0
        m = np.einsum("bsm,bm->bs", np.linalg.pinv(lhs), rhs)
        return J.ravel(), np.repeat(cols, sz), m.ravel()


PC.register_impl("spai", _PCSPAI)


class _PCNN:
    """PCNN (is/nn): two-level additive Neumann-Neumann on MATIS:

        M^-1 = sum_i R_i^T D_i K_i^+ D_i R_i  +  W Kc^-1 W^T

    with K_i the local Neumann matrices (singular — handled by the
    pseudo-inverse, the role of nn.c's local solve shifts), D_i = 1/
    multiplicity partition-of-unity scaling, and the coarse space W the
    multiplicity-scaled subdomain constants (the classical NN balancing
    space). The reference applies the coarse level multiplicatively
    (balanced NN); the additive form here has the same coarse space and
    O(1) iteration scaling for SPD problems, and is documented as the
    variant implemented. Like PCBDDC above, subdomain blocks are padded
    to one size so the apply is batched einsums on the MXU."""

    def __init__(self, pc):
        self.pc = pc

    def set_from_options(self):
        pass

    def setup(self):
        from ..mat.utility import MatIS
        M = self.pc.pmat
        if not isinstance(M, MatIS):
            raise Error("PCNN requires a MATIS operator "
                        "(MatIS.create with local Neumann matrices)")
        mats, maps = M.getLocalMats()
        ns = len(mats)
        mult = M.interface_multiplicity()
        nl = max(len(g) for g in maps)
        G = np.zeros((ns, nl), dtype=np.int64)
        D = np.zeros((ns, nl))
        Kinv = np.zeros((ns, nl, nl))
        W = []
        for s, (Ai, gi) in enumerate(zip(mats, maps)):
            K = Ai.toarray() if hasattr(Ai, "toarray") else np.asarray(Ai)
            gi = np.asarray(gi, dtype=np.int64)
            k = len(gi)
            G[s, :k] = gi
            D[s, :k] = 1.0 / mult[gi]
            Kinv[s, :k, :k] = np.linalg.pinv(K)
        npad = M.row_layout.Npad
        Wm = np.zeros((ns, npad))
        for s in range(ns):
            k = (D[s] > 0).sum()
            Wm[s, G[s, :int(k)]] += D[s, :int(k)]
        # coarse operator Kc = W A W^T through the assembled MATIS action
        Aop = operator.bind(M.meta, M.device_data())
        AW = np.stack([np.asarray(Aop.mult(jnp.asarray(w))) for w in Wm])
        Kc = Wm @ AW.T
        Kc_inv = np.linalg.pinv(Kc)
        rd = config.real_dtype()
        data = {"G": jnp.asarray(G), "D": jnp.asarray(D, rd),
                "Kinv": jnp.asarray(Kinv, rd),
                "W": jnp.asarray(Wm, rd),
                "Kc_inv": jnp.asarray(Kc_inv, rd)}
        return ("pc_nn", ns, nl, npad), data


def _bind_nn(meta, data):
    _, ns, nl, npad = meta
    G, D, Kinv, W, Kc_inv = (data["G"], data["D"], data["Kinv"],
                             data["W"], data["Kc_inv"])

    def mult(r):
        rl = r[G] * D
        zl = jnp.einsum("sij,sj->si", Kinv, rl) * D
        y = jnp.zeros(npad, r.dtype).at[G.reshape(-1)].add(zl.reshape(-1))
        rc = W @ r
        y = y + W.T @ (Kc_inv @ rc)
        return y

    return operator.Op(mult=mult)


operator.register_binder("pc_nn", _bind_nn)
PC.register_impl("nn", _PCNN)
