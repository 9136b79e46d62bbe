"""Utility/wrapper matrix formats: implicit transpose, normal (A^T A),
diagonal, composite (sum/product), low-rank correction, nest, centering.

Behavioral reference: src/mat/impls/{transpose (MATTRANSPOSEVIRTUAL),
normal/normm.c (MATNORMAL), diagonal, composite (MATCOMPOSITE
additive/multiplicative), lrc (MATLRC: A + U C V^T), nest (MATNEST),
cdbdm (MATCENTERING I - (1/n) 1 1^T)}. In the TPU design these are a few
lines each: an Op closure over the wrapped operators — the jit
composability contract makes 'wrapper formats' nearly free.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import config
from ..ops import operator
from ..sys.error import Error
from .mat import Mat


class _WrapperMat(Mat):
    """Common plumbing: subclasses define _meta/_data at create time."""

    def __init__(self, comm=None, **kw):
        super().__init__(comm, **kw)
        self._meta_v = None
        self._data_v = None
        self._assembled = True

    @property
    def meta(self):
        return self._meta_v

    def device_data(self):
        return self._data_v


class MatTranspose(_WrapperMat):
    """A^T without forming it (MatCreateTranspose)."""

    @classmethod
    def create(cls, A, comm=None):
        M = cls(comm or A.comm)
        m, n = A.getSize()
        M.setSizes((n, m))
        M._meta_v = ("mat_transpose", A.meta)
        M._data_v = {"A": A.device_data()}
        return M


def _bind_transpose(meta, data):
    inner = operator.bind(meta[1], data["A"])
    if inner.mult_t is None:
        raise Error("MatTranspose: wrapped operator has no mult_t")
    return operator.Op(mult=inner.mult_t, mult_t=inner.mult)


class MatNormal(_WrapperMat):
    """A^T A (MatCreateNormal, normm.c) — least squares operator."""

    @classmethod
    def create(cls, A, comm=None):
        M = cls(comm or A.comm)
        m, n = A.getSize()
        M.setSizes((n, n))
        M._meta_v = ("mat_normal", A.meta)
        M._data_v = {"A": A.device_data()}
        return M


def _bind_normal(meta, data):
    inner = operator.bind(meta[1], data["A"])
    mult = lambda x: inner.mult_t(inner.mult(x))
    return operator.Op(mult=mult, mult_t=mult)


class MatDiagonal(_WrapperMat):
    """diag(d) (MatCreateDiagonal)."""

    @classmethod
    def create(cls, d, comm=None):
        from ..vec.vec import Vec
        arr = d.array if isinstance(d, Vec) else jnp.asarray(
            np.asarray(d), dtype=config.real_dtype())
        M = cls(comm)
        M.setSizes((arr.shape[0], arr.shape[0]))
        M._meta_v = ("mat_diagonal", int(arr.shape[0]))
        M._data_v = {"d": arr}
        return M


def _bind_diagonal(meta, data):
    d = data["d"]
    return operator.Op(mult=lambda x: d * x, mult_t=lambda x: d * x,
                       diag=lambda: d)


class MatComposite(_WrapperMat):
    """Sum or product of matrices (MatCreateComposite; composite.c).
    additive: y = (A_1 + ... + A_k) x; multiplicative: y = A_k ... A_1 x."""

    @classmethod
    def create(cls, mats, ctype="additive", comm=None):
        M = cls(comm or mats[0].comm)
        M.setSizes(mats[0].getSize() if ctype == "additive"
                   else (mats[-1].getSize()[0], mats[0].getSize()[1]))
        M._meta_v = ("mat_composite", ctype, tuple(A.meta for A in mats))
        M._data_v = {"mats": tuple(A.device_data() for A in mats)}
        return M


def _bind_composite(meta, data):
    _, ctype, metas = meta
    ops = [operator.bind(mi, di) for mi, di in zip(metas, data["mats"])]

    def mult(x):
        if ctype == "additive":
            y = ops[0].mult(x)
            for o in ops[1:]:
                y = y + o.mult(x)
            return y
        y = x
        for o in ops:
            y = o.mult(y)
        return y

    return operator.Op(mult=mult)


class MatLRC(_WrapperMat):
    """Low-rank correction A + U C V^T (MatCreateLRC, lrc.c); U,V dense
    (n,k), C dense (k,k) or None for identity."""

    @classmethod
    def create(cls, A, U, C=None, V=None, comm=None):
        M = cls(comm or (A.comm if A is not None else None))
        Uj = jnp.asarray(np.asarray(U), dtype=config.real_dtype())
        Vj = Uj if V is None else jnp.asarray(np.asarray(V),
                                              dtype=config.real_dtype())
        Cj = None if C is None else jnp.asarray(np.asarray(C),
                                                dtype=config.real_dtype())
        n = Uj.shape[0]
        M.setSizes((n, n))
        M._meta_v = ("mat_lrc", None if A is None else A.meta, C is None)
        M._data_v = {"A": None if A is None else A.device_data(),
                     "U": Uj, "V": Vj,
                     "C": Cj if Cj is not None else jnp.zeros(())}
        return M


def _bind_lrc(meta, data):
    _, ameta, c_is_id = meta
    U, V = data["U"], data["V"]
    inner = None if ameta is None else operator.bind(ameta, data["A"])

    def mult(x):
        t = V.T @ x
        if not c_is_id:
            t = data["C"] @ t
        y = U @ t
        if inner is not None:
            y = y + inner.mult(x)
        return y

    return operator.Op(mult=mult)


class MatCentering(_WrapperMat):
    """I - (1/n) 1 1^T (MatCreateCentering)."""

    @classmethod
    def create(cls, n, comm=None):
        M = cls(comm)
        M.setSizes((n, n))
        M._meta_v = ("mat_centering", int(n))
        M._data_v = {}
        return M


def _bind_centering(meta, data):
    n = meta[1]
    mult = lambda x: x - jnp.mean(x[:n])
    return operator.Op(mult=mult, mult_t=mult)


class MatNest(_WrapperMat):
    """Block matrix of sub-mats (MatCreateNest; impls/nest). Blocks may be
    None (zero). Vectors are the flat concatenation of row/col segments."""

    @classmethod
    def create(cls, blocks, comm=None):
        nr = len(blocks)
        nc = len(blocks[0])
        row_sizes = [None] * nr
        col_sizes = [None] * nc
        for i in range(nr):
            for j in range(nc):
                if blocks[i][j] is not None:
                    m, n = blocks[i][j].getSize()
                    row_sizes[i] = m
                    col_sizes[j] = n
        if any(s is None for s in row_sizes + col_sizes):
            raise Error("MatNest: every row/col needs at least one block")
        comm = comm or next(b.comm for r in blocks for b in r
                            if b is not None)
        M = cls(comm)
        M.setSizes((sum(row_sizes), sum(col_sizes)))
        M._row_sizes, M._col_sizes = row_sizes, col_sizes
        M._meta_v = ("mat_nest", tuple(row_sizes), tuple(col_sizes),
                     tuple(tuple(None if b is None else b.meta
                                 for b in r) for r in blocks))
        M._data_v = {"blocks": tuple(tuple(
            None if b is None else b.device_data() for b in r)
            for r in blocks)}
        return M


def _bind_nest(meta, data):
    _, row_sizes, col_sizes, metas = meta
    roff = np.concatenate([[0], np.cumsum(row_sizes)])
    coff = np.concatenate([[0], np.cumsum(col_sizes)])
    ops = [[None if metas[i][j] is None else
            operator.bind(metas[i][j], data["blocks"][i][j])
            for j in range(len(col_sizes))] for i in range(len(row_sizes))]

    def mult(x):
        segs = []
        for i in range(len(row_sizes)):
            yi = jnp.zeros((row_sizes[i],), dtype=x.dtype)
            for j in range(len(col_sizes)):
                if ops[i][j] is not None:
                    yi = yi + ops[i][j].mult(x[coff[j]:coff[j + 1]])
            segs.append(yi)
        return jnp.concatenate(segs)

    return operator.Op(mult=mult)


operator.register_binder("mat_transpose", _bind_transpose)
operator.register_binder("mat_normal", _bind_normal)
operator.register_binder("mat_diagonal", _bind_diagonal)
operator.register_binder("mat_composite", _bind_composite)
operator.register_binder("mat_lrc", _bind_lrc)
operator.register_binder("mat_centering", _bind_centering)
operator.register_binder("mat_nest", _bind_nest)


class MatSchurComplement(_WrapperMat):
    """S = A11 - A10 inv(A00) A01 applied implicitly (MatCreateSchur-
    Complement, src/ksp/ksp/utils/schurm/schurm.c). The inner inv(A00) is a
    full compiled KSP solve (the (meta, data) jit contract lets a Krylov
    loop nest inside the outer operator), so S composes into any outer
    solver — including another KSP — as one XLA program.

    getKSP() exposes the inner solver (MatSchurComplementGetKSP) for
    configuring type/tolerances before first use."""

    @classmethod
    def create(cls, A00, A01, A10, A11=None, comm=None, ksp=None):
        M = cls(comm or A00.comm)
        m = A10.getSize()[0]
        n = A01.getSize()[1]
        M.setSizes((m, n))
        M._blocks = (A00, A01, A10, A11)
        M._ksp = ksp
        M._meta_v = None          # built lazily after KSP config
        return M

    def getKSP(self):
        if self._ksp is None:
            from ..ksp.ksp import KSP
            self._ksp = KSP().create()
            self._ksp.setOperators(self._blocks[0])
        return self._ksp

    def getSubMatrices(self):
        return self._blocks

    def _build(self):
        if self._meta_v is not None:
            return
        A00, A01, A10, A11 = self._blocks
        ksp = self.getKSP()
        if ksp._type is None:
            ksp.setFromOptions()
        ksp.setUp()
        cfg = ksp._static_cfg()
        self._meta_v = ("mat_schur", ksp._type, A00.meta, ksp.pc.meta, cfg,
                        float(ksp.rtol), float(ksp.abstol),
                        float(ksp.divtol), A01.meta, A10.meta,
                        None if A11 is None else A11.meta)
        self._data_v = {
            "A00": A00.device_data(), "B00": ksp.pc.device_data(),
            "A01": A01.device_data(), "A10": A10.device_data(),
            "A11": None if A11 is None else A11.device_data(),
        }

    @property
    def meta(self):
        self._build()
        return self._meta_v

    def device_data(self):
        self._build()
        return self._data_v


def _bind_mat_schur(meta, data):
    from ..ksp.ksp import _IMPLS
    (_, ktype, m00, mpc, cfg, rtol, abstol, divtol,
     m01, m10, m11) = meta
    fn = _IMPLS[ktype]["fn"]
    A00 = operator.bind(m00, data["A00"])
    B00 = operator.bind(mpc, data["B00"])
    A01 = operator.bind(m01, data["A01"])
    A10 = operator.bind(m10, data["A10"])
    A11 = None if m11 is None else operator.bind(m11, data["A11"])

    def mult(x):
        w = A01.mult(x)
        res = fn(A00, B00, w, jnp.zeros_like(w), rtol, abstol, divtol, cfg)
        y = -A10.mult(res.x)
        if A11 is not None:
            y = y + A11.mult(x)
        return y

    return operator.Op(mult=mult)


operator.register_binder("mat_schur", _bind_mat_schur)


class MatMAIJ(_WrapperMat):
    """I_dof ⊗ A in interlaced (node-major) ordering: y[i*d+c] =
    sum_j A[i,j] x[j*d+c] (MatCreateMAIJ, impls/maij — the multi-component
    interpolation wrapper PCMG uses for dof>1 fields). Device apply is A
    vmapped over the component axis — one batched SpMV."""

    @classmethod
    def create(cls, A, dof, comm=None):
        M = cls(comm or A.comm)
        m, n = A.getSize()
        M.dof = int(dof)
        M.setSizes((m * M.dof, n * M.dof))
        M._meta_v = ("mat_maij", A.meta, M.dof, n)
        M._data_v = {"A": A.device_data()}
        M._base = A
        return M

    def getAIJ(self):
        return self._base


def _bind_mat_maij(meta, data):
    import jax
    _, ameta, dof, n = meta
    A = operator.bind(ameta, data["A"])

    def mult(x):
        X = x[: n * dof].reshape(n, dof)
        Y = jax.vmap(A.mult, in_axes=1, out_axes=1)(X)
        return Y.reshape(-1)

    def mult_t(x):
        mt = A.mult_t
        X = x.reshape(-1, dof) if x.shape[0] % dof == 0 \
            else x[: (x.shape[0] // dof) * dof].reshape(-1, dof)
        Y = jax.vmap(mt, in_axes=1, out_axes=1)(X)
        return Y.reshape(-1)

    return operator.Op(mult=mult, mult_t=mult_t)


operator.register_binder("mat_maij", _bind_mat_maij)


class MatPreallocator(_WrapperMat):
    """MATPREALLOCATOR (impls/preallocator): a pattern-recording dry-run
    matrix. Dynamic host assembly makes preallocation unnecessary here;
    the class records the pattern so code written against the reference's
    two-pass idiom runs unchanged and `preallocate(B)` hands the pattern
    to a real matrix."""

    def __init__(self, comm=None, **kw):
        super().__init__(comm, **kw)
        self._rows: list = []
        self._cols: list = []

    @classmethod
    def create(cls, size, comm=None):
        M = cls(comm)
        M.setSizes((size, size) if np.isscalar(size) else size)
        return M

    def setValues(self, rows, cols, values=None, addv=None):
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        cols = np.atleast_1d(np.asarray(cols, dtype=np.int64))
        self._rows.append(np.repeat(rows, len(cols)))
        self._cols.append(np.tile(cols, len(rows)))

    def assemble(self, *a):
        return self

    assemblyBegin = assemblyEnd = lambda self, *a: None

    def preallocate(self, B, fill_zero=True):
        """MatPreallocatorPreallocate: stamp the recorded pattern into B."""
        import scipy.sparse as sp
        r = np.concatenate(self._rows) if self._rows else np.zeros(0, int)
        c = np.concatenate(self._cols) if self._cols else np.zeros(0, int)
        m, n = self.getSize()
        S = sp.csr_matrix((np.ones(len(r)), (r, c)), shape=(m, n))
        S.sum_duplicates()
        B.setValuesCSR(S.indptr, S.indices, np.zeros(S.nnz))
        B.assemble()
        return B


class MatIS(_WrapperMat):
    """MATIS (impls/is/matis.c): the unassembled domain-decomposition
    format A = sum_i R_i^T A_i R_i — each subdomain holds its LOCAL
    (Neumann) matrix plus a local-to-global map; nothing is ever summed
    into a global CSR unless asked (MatISGetMPIXAIJ -> assemble()).

    TPU realization: the subdomain matrices become one BATCH. Local mats
    are padded to a common size and stacked (nsub, nl, nl) dense (BDDC/
    FETI subdomains are small and dense-ish after factorization), the
    l2g maps become gather/scatter index tables, and the apply is ONE
    batched matmul between a gather and a scatter-add — MXU-friendly and
    the natural analog of the reference's per-rank local mults."""

    @classmethod
    def create(cls, size, local_mats, l2g_maps, comm=None):
        M = cls(comm)
        M.setSizes((size, size) if np.isscalar(size) else size)
        nsub = len(local_mats)
        nl = max(len(m_) for m_ in l2g_maps)
        Ab = np.zeros((nsub, nl, nl))
        G = np.zeros((nsub, nl), dtype=np.int64)
        valid = np.zeros((nsub, nl))
        for i, (Ai, gi) in enumerate(zip(local_mats, l2g_maps)):
            Ai = Ai.toarray() if hasattr(Ai, "toarray") else np.asarray(Ai)
            k = len(gi)
            Ab[i, :k, :k] = Ai
            G[i, :k] = np.asarray(gi, dtype=np.int64)
            valid[i, :k] = 1.0
        M._meta_v = ("mat_is", nsub, nl, M.row_layout.Npad)
        M._data_v = {"Ab": jnp.asarray(Ab, config.real_dtype()),
                     "G": jnp.asarray(G),
                     "valid": jnp.asarray(valid, config.real_dtype())}
        M._locals = (local_mats, l2g_maps)
        return M

    def getLocalMats(self):
        return self._locals

    def assemble_global(self):
        """MatISGetMPIXAIJ: sum into an assembled MatAIJ."""
        import scipy.sparse as sp
        from .aij import MatAIJ
        m, n = self.getSize()
        rows, cols, vals = [], [], []
        for Ai, gi in zip(*self._locals):
            Ai = sp.coo_matrix(Ai)
            gi = np.asarray(gi)
            rows.append(gi[Ai.row])
            cols.append(gi[Ai.col])
            vals.append(Ai.data)
        S = sp.csr_matrix((np.concatenate(vals),
                           (np.concatenate(rows), np.concatenate(cols))),
                          shape=(m, n))
        S.sum_duplicates()
        return MatAIJ.from_scipy(S, comm=self.comm)

    def interface_multiplicity(self):
        """How many subdomains touch each global dof (the D_i scaling
        BDDC/NN preconditioners need)."""
        m = self.getSize()[0]
        cnt = np.zeros(m)
        for gi in self._locals[1]:
            cnt[np.asarray(gi)] += 1.0
        return cnt


def _bind_mat_is(meta, data):
    _, nsub, nl, npad = meta
    Ab, G, valid = data["Ab"], data["G"], data["valid"]

    def mult(x):
        xl = x[G] * valid                       # (nsub, nl) gather
        yl = jnp.einsum("sij,sj->si", Ab, xl)   # batched local mults (MXU)
        y = jnp.zeros(npad, x.dtype)
        return y.at[G.reshape(-1)].add((yl * valid).reshape(-1))

    return operator.Op(mult=mult)


operator.register_binder("mat_is", _bind_mat_is)


class MatLocalRef(_WrapperMat):
    """MatCreateLocalRef (impls/localref): a window onto a parent matrix
    through row/col index sets — setValues through the window land in the
    parent (used by DMComposite/fieldsplit assembly); its own apply is the
    parent's submatrix."""

    @classmethod
    def create(cls, parent, isrow, iscol=None):
        M = cls(parent.comm)
        M._parent = parent
        M._ir = np.asarray(isrow, dtype=np.int64)
        M._ic = M._ir if iscol is None else np.asarray(iscol,
                                                       dtype=np.int64)
        M.setSizes((len(M._ir), len(M._ic)))
        return M

    def setValues(self, rows, cols, values, addv=None):
        from .mat import InsertMode
        rows = self._ir[np.atleast_1d(np.asarray(rows, dtype=np.int64))]
        cols = self._ic[np.atleast_1d(np.asarray(cols, dtype=np.int64))]
        self._parent.setValues(rows, cols, values,
                               addv if addv is not None
                               else InsertMode.INSERT_VALUES)
        return self

    def assemble(self, *a):
        return self._parent.assemble()

    assemblyBegin = lambda self, *a: None
    assemblyEnd = assemble

    @property
    def meta(self):
        from .aij import MatAIJ
        sub = self._parent.createSubMatrix(self._ir, self._ic)
        self._sub = sub
        return sub.meta

    def device_data(self):
        if not hasattr(self, "_sub"):
            _ = self.meta
        return self._sub.device_data()
