"""PC: preconditioners.

Reference: PC interface (src/ksp/pc/interface/precon.c — PCApply :523,
PCSetUp :1095 with its setupcalled/operator-state reuse logic) and the 53
registered impls (pcregis.c). Same jit-composability contract as Mat:
setup() builds (meta, data); ops.operator binders reconstruct a pure
apply(x) -> y inside jitted solver loops.

Implemented types: none, jacobi (diagonal/rowmax/rowsum/rowl1 variants,
src/ksp/pc/impls/jacobi/jacobi.c — zero diagonals fixed to 1.0), pbjacobi
(batched small-block inverses, the TPU-native form of
pbjacobi_cuda.cu), shell, plus (in sibling modules) ilu/icc, bjacobi, sor,
asm, mg, gamg, fieldsplit, ksp, composite.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import config
from ..ops import operator
from ..sys.error import Error, PCFailedReason
from ..sys.object import PObject


class PCSide:
    LEFT = "left"
    RIGHT = "right"
    SYMMETRIC = "symmetric"


class PC(PObject):
    _class_name = "PC"
    _impls: dict[str, type] = {}

    def __init__(self, comm=None, **kw):
        super().__init__(**kw)
        self.comm = comm
        self.mat = None           # operator A
        self.pmat = None          # matrix the PC is built from
        self._impl = None
        self._meta = None
        self._data = None
        self.failed_reason = PCFailedReason.NOERROR
        self.side = PCSide.LEFT
        self._type = None

    @classmethod
    def register_impl(cls, name, impl):
        cls._impls[name] = impl

    def create(self, comm=None):
        self.comm = comm or self.comm
        return self

    def setOperators(self, A, P=None):
        self.mat = A
        self.pmat = P if P is not None else A
        if self.comm is None:
            self.comm = A.comm
        self._setup_called = False
        return self

    def getOperators(self):
        return self.mat, self.pmat

    def setType(self, name: str):
        if name not in self._impls:
            raise KeyError(f"Unknown PC type '{name}'. Registered: "
                           f"{', '.join(sorted(self._impls))}")
        if self._type != name:
            self._type = name
            self._impl = self._impls[name](self)
            self._setup_called = False
        return self

    def getType(self):
        return self._type

    def setFromOptions(self):
        t = self.opt("get_string", "pc_type", default=None)
        if t:
            self.setType(t)
        if self._impl is None and self._type is None:
            self.setType(self.default_type())
        if self._impl is not None and hasattr(self._impl, "set_from_options"):
            self._impl.set_from_options()
        return self

    def default_type(self):
        # PETSc defaults: ILU for 1 rank, block-Jacobi for parallel
        if self.pmat is not None and getattr(self.pmat.comm, "nshards", 1) > 1:
            return "bjacobi"
        from ..mat.aij import MatAIJ
        if isinstance(self.pmat, MatAIJ):
            return "ilu"
        return "none"

    # -------- fieldsplit public surface (petsc4py PC naming) --------

    def setFieldSplitIS(self, *fields):
        """PCFieldSplitSetIS (fieldsplit.c): each field a (name, indices)
        pair. Requires pc_type fieldsplit (set it first or via options)."""
        if self._impl is None or self._type != "fieldsplit":
            self.setType("fieldsplit")
        for name, iset in fields:
            self._impl.setIS(name, iset)
        return self

    def setFieldSplitFields(self, bs, *fields):
        """PCFieldSplitSetFields: strided component splits of block size
        bs (each field a component index or tuple of components)."""
        if self._impl is None or self._type != "fieldsplit":
            self.setType("fieldsplit")
        self._impl.setFields(bs, *fields)
        return self

    def setFieldSplitType(self, ftype):
        """PCFieldSplitSetType: additive | multiplicative |
        symmetric_multiplicative | schur."""
        if self._impl is None or self._type != "fieldsplit":
            self.setType("fieldsplit")
        self._impl.ftype = ftype
        return self

    def setFieldSplitSchurPreType(self, pre):
        """PCFieldSplitSetSchurPre: a11 | selfp."""
        if self._impl is None or self._type != "fieldsplit":
            self.setType("fieldsplit")
        self._impl.schur_pre = pre
        return self

    def setUp(self):
        """PCSetUp (precon.c:1095): rebuild only if the operator changed
        since the last setup — the state-counter reuse logic."""
        if self._type is None:
            self.setFromOptions()
        if self._setup_called and self.pmat is not None \
                and self._setup_state == self.pmat.state:
            return self
        import time as _time
        _t0 = _time.perf_counter()
        self._meta, self._data = self._impl.setup()
        from .. import config as _cfg
        _cfg.compile_cache_tick()  # bounded compiled-executable policy
        _cfg.log().log_event(f"PCSetUp_{self._type}",
                             _time.perf_counter() - _t0)
        self._setup_called = True
        if self.pmat is not None:
            self._setup_state = self.pmat.state
        return self

    def setCoordinates(self, coords):
        """PCSetCoordinates (gamg.c): attach nodal coordinates — used by
        GAMG's geometric variant and rigid-body near-nullspace builders."""
        import numpy as _np
        self._coords = _np.asarray(coords, dtype=_np.float64)
        return self

    # ---------------- contract ----------------

    @property
    def meta(self):
        self.setUp()
        return self._meta

    def device_data(self):
        self.setUp()
        return self._data

    def op(self) -> operator.Op:
        return operator.bind(self.meta, self.device_data())

    def apply(self, x, y=None):
        """y <- B x (precon.c:523)."""
        from ..vec.vec import Vec
        if y is None:
            y = x.duplicate()
        y.array = self.op().mult(x.array)
        return y

    def applyTranspose(self, x, y=None):
        if y is None:
            y = x.duplicate()
        op = self.op()
        if op.mult_t is None:
            raise Error(f"PC {self._type} has no transpose apply")
        y.array = op.mult_t(x.array)
        return y

    def view(self, viewer=None):
        print(f"PC Object: ({self._prefix}) type: {self._type}")
        if self._impl is not None and hasattr(self._impl, "view"):
            self._impl.view()


# =====================================================================
# basic impls
# =====================================================================

class _PCNone:
    def __init__(self, pc):
        self.pc = pc

    def setup(self):
        return ("pc_none",), {}


def _bind_pc_none(meta, data):
    return operator.Op(mult=lambda x: x, mult_t=lambda x: x)


class _PCJacobi:
    """Diagonal scaling (jacobi.c). Variants: diagonal (default), rowmax,
    rowsum, rowl1; optional abs / sqrt forms; zero entries fixed to 1.0."""

    def __init__(self, pc):
        self.pc = pc
        self.variant = "diagonal"
        self.use_abs = False
        self.rowl1_scale = 1.0

    def set_from_options(self):
        o = self.pc
        t = o.opt("get_string", "pc_jacobi_type", default=None)
        if t:
            self.variant = t
        if o.opt("get_bool", "pc_jacobi_abs", default=False):
            self.use_abs = True

    def setup(self):
        A = self.pc.pmat
        if self.variant == "diagonal":
            d = A.op().diag()
        else:
            sp = A.to_scipy()
            if self.variant == "rowmax":
                d = jnp.asarray(np.abs(sp).max(axis=1).toarray().ravel())
            elif self.variant == "rowsum":
                d = jnp.asarray(np.asarray(sp.sum(axis=1)).ravel())
            elif self.variant == "rowl1":
                absrow = np.asarray(np.abs(sp).sum(axis=1)).ravel()
                diag = sp.diagonal()
                d = jnp.asarray(diag + self.rowl1_scale * (absrow - np.abs(diag)))
            else:
                raise Error(f"unknown jacobi variant {self.variant}")
            d = _pad_to(d, A.row_layout.Npad)
        if self.use_abs:
            d = jnp.abs(d)
        inv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)
        # keep padding rows at 0 so the zero-tail invariant survives PCApply
        pad = A.row_layout.pad
        if pad:
            n = A.row_layout.Npad
            import jax
            mask = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0] < A.row_layout.N
            inv = jnp.where(mask, inv, 0.0)
        return ("pc_jacobi",), {"inv": inv}


def _pad_to(d, npad):
    if d.shape[0] < npad:
        d = jnp.pad(d, (0, npad - d.shape[0]))
    return d


def _bind_pc_jacobi(meta, data):
    inv = data["inv"]
    return operator.Op(mult=lambda x: inv * x, mult_t=lambda x: inv * x,
                       diag=lambda: inv)


class _PCPBJacobi:
    """Point-block Jacobi: invert the bs x bs diagonal blocks, batched —
    vpbjacobi_cuda.cu's role done with one batched jnp.linalg.inv."""

    def __init__(self, pc):
        self.pc = pc

    def setup(self):
        A = self.pc.pmat
        bs = A.getBlockSize()
        if bs <= 1:
            bs = self.pc.opt("get_int", "pc_pbjacobi_block_size", default=1)
        m = A.row_layout.Npad
        if m % bs:
            raise Error(f"rows {m} not divisible by block size {bs}")
        sp = A.to_scipy()
        nb = A.row_layout.N // bs
        blocks = np.zeros((m // bs, bs, bs))
        # extract diagonal blocks from CSR (host symbolic phase)
        coo = sp.tocoo()
        sel = (coo.row // bs) == (coo.col // bs)
        r, c, v = coo.row[sel], coo.col[sel], coo.data[sel]
        blocks[r // bs, r % bs, c % bs] = v
        # padding blocks -> identity so inv is well-defined; their rows are
        # zero anyway
        for k in range(nb, m // bs):
            blocks[k] = np.eye(bs)
        singular = np.abs(np.linalg.det(blocks)) < 1e-300
        blocks[singular] += np.eye(bs)[None]
        inv = jnp.asarray(np.linalg.inv(blocks), dtype=config.real_dtype())
        return ("pc_pbjacobi", bs), {"inv": inv}


def _bind_pc_pbjacobi(meta, data):
    bs = meta[1]
    inv = data["inv"]

    def mult(x):
        xb = x.reshape(-1, bs)
        return jnp.einsum("nij,nj->ni", inv, xb).reshape(-1)

    def mult_t(x):
        xb = x.reshape(-1, bs)
        return jnp.einsum("nji,nj->ni", inv, xb).reshape(-1)

    return operator.Op(mult=mult, mult_t=mult_t)


class _PCShell:
    def __init__(self, pc):
        self.pc = pc
        self.handle = None
        self.context = None

    def set_apply(self, apply, apply_transpose=None, context=None):
        self.handle = operator.register_shell(
            {"mult": apply, "mult_t": apply_transpose, "diag": None})
        self.context = context
        return self

    def setup(self):
        if self.handle is None:
            raise Error("PCShell: call pc.setShellApply(fn) first")
        return ("shell", self.handle), self.context


def _pc_shell_set(pc: PC, apply, apply_transpose=None, context=None):
    pc.setType("shell")
    pc._impl.set_apply(apply, apply_transpose, context)
    return pc


PC.setShellApply = _pc_shell_set

PC.register_impl("none", _PCNone)
PC.register_impl("jacobi", _PCJacobi)
PC.register_impl("pbjacobi", _PCPBJacobi)
PC.register_impl("shell", _PCShell)

operator.register_binder("pc_none", _bind_pc_none)
operator.register_binder("pc_jacobi", _bind_pc_jacobi)
operator.register_binder("pc_pbjacobi", _bind_pc_pbjacobi)
