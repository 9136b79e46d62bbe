"""Mat base class, matrix-free Shell and Dense implementations.

Reference: Mat interface (src/mat/interface/matrix.c — MatMult :2696,
MatAssemblyBegin :6255, ownership ranges, norms) and the ~150-op vtable
(include/petsc/private/matimpl.h). The TPU redesign keeps the lifecycle
(create → set sizes/type → set values → assemble → mult) and the
symbolic/numeric split: host-side numpy "symbolic" state (sparsity, plans)
plus device-side "numeric" pytrees, bound to pure functions via
ops.operator.bind for jit-composable solver loops.
"""

from __future__ import annotations

from enum import IntEnum

import jax.numpy as jnp
import numpy as np

from .. import config
from ..ops import operator
from ..parallel.layout import Layout
from ..parallel.mesh import Comm, comm_self
from ..sys.object import PObject
from ..vec.vec import InsertMode, NormType, Vec


class MatStructure(IntEnum):  # include/petscmat.h MatStructure
    DIFFERENT_NONZERO_PATTERN = 0
    SUBSET_NONZERO_PATTERN = 1
    SAME_NONZERO_PATTERN = 2
    UNKNOWN_NONZERO_PATTERN = 3


class Mat(PObject):
    _class_name = "Mat"

    def __init__(self, comm: Comm | None = None, **kw):
        super().__init__(**kw)
        self.comm = comm or comm_self()
        self.row_layout: Layout | None = None
        self.col_layout: Layout | None = None
        self._assembled = False
        self.nullspace = None       # MatNullSpace analog (list of Vecs + has_const)
        self.near_nullspace = None  # for GAMG (matnull.c analog)
        self.symmetric = None

    # ---------------- factories (petsc4py-style) ----------------

    @staticmethod
    def createAIJ(size, csr=None, coo=None, comm=None, bs=1):
        from .aij import MatAIJ
        m, n = size if isinstance(size, tuple) else (size, size)
        A = MatAIJ(comm)
        A.setSizes((m, n), bs=bs)
        if csr is not None:
            A.setValuesCSR(*csr)
            A.assemble()
        elif coo is not None:
            i, j, v = coo
            A.setPreallocationCOO(i, j)
            A.setValuesCOO(v)
        return A

    @staticmethod
    def createAIJWithArrays(size, csr, comm=None):
        return Mat.createAIJ(size, csr=csr, comm=comm)

    @staticmethod
    def createDense(size, array=None, comm=None):
        A = MatDense(comm)
        m, n = size if isinstance(size, tuple) else (size, size)
        A.setSizes((m, n))
        if array is not None:
            A.setDenseArray(array)
        return A

    @staticmethod
    def createShell(size, mult, mult_transpose=None, diag=None, context=None, comm=None):
        A = MatShell(comm)
        m, n = size if isinstance(size, tuple) else (size, size)
        A.setSizes((m, n))
        A.setShellOperations(mult, mult_transpose, diag, context)
        return A

    @staticmethod
    def createStencil(grid, offsets, coeffs, comm=None):
        """Grid-stencil matrix from per-offset coefficient arrays
        (the dnd fast-path layout, DMDA/fdda.c matrices): grid=(...,ny,nx),
        offsets=[(dz,dy,dx)...], coeffs=(K,)+grid. Out-of-range couplings
        must already be zero in coeffs."""
        from .aij import MatAIJ
        import scipy.sparse as sp
        grid = tuple(int(g) for g in grid)
        N = int(np.prod(grid))
        idx = np.arange(N)
        multi = np.stack(np.unravel_index(idx, grid), axis=1)
        rows_l, cols_l, vals_l = [], [], []
        for k, off in enumerate(offsets):
            nb = multi + np.asarray(off)
            ok = np.ones(N, dtype=bool)
            for ax in range(len(grid)):
                ok &= (nb[:, ax] >= 0) & (nb[:, ax] < grid[ax])
            cols = np.ravel_multi_index(tuple(nb[ok].T), grid)
            vals = np.asarray(coeffs[k]).reshape(-1)[ok]
            nz = vals != 0
            rows_l.append(idx[ok][nz])
            cols_l.append(cols[nz])
            vals_l.append(vals[nz])
        A_sp = sp.csr_matrix(
            (np.concatenate(vals_l),
             (np.concatenate(rows_l), np.concatenate(cols_l))),
            shape=(N, N))
        A = MatAIJ.from_scipy(A_sp, comm=comm)
        A.setStencilGrid(grid)
        return A

    # ---------------- sizes ----------------

    def setSizes(self, size, bs: int = 1):
        m, n = size if isinstance(size, tuple) else (size, size)
        self.row_layout = Layout(int(m), self.comm.nshards, bs=bs, axis=self.comm.axis)
        # columns follow the row decomposition of the *vector* the mat acts on
        self.col_layout = Layout(int(n), self.comm.nshards, bs=bs, axis=self.comm.axis)
        return self

    def setBlockSize(self, bs: int):
        """MatSetBlockSize: dof blocking (BAIJ layout + nodal graph ops)."""
        self.row_layout = Layout(self.row_layout.N, self.comm.nshards,
                                 bs=bs, axis=self.comm.axis)
        self.col_layout = Layout(self.col_layout.N, self.comm.nshards,
                                 bs=bs, axis=self.comm.axis)
        if getattr(self, "_indptr", None) is not None and self._assembled:
            self._build_device()
        return self

    def getBlockSize(self):
        return self.row_layout.bs

    def getSize(self):
        return (self.row_layout.N, self.col_layout.N)

    def getLocalSize(self):
        return (self.row_layout.block, self.col_layout.block)

    def getOwnershipRange(self, shard=None):
        if shard is None:
            return (0, self.row_layout.N) if self.comm.nshards == 1 else self.row_layout.range(0)
        return self.row_layout.range(shard)

    def getBlockSize(self):
        return self.row_layout.bs

    @property
    def shape(self):
        return self.getSize()

    def isAssembled(self):
        return self._assembled

    # ---------------- the jit-composability contract ----------------

    @property
    def meta(self) -> tuple:
        raise NotImplementedError

    def device_data(self):
        raise NotImplementedError

    def op(self) -> operator.Op:
        return operator.bind(self.meta, self.device_data())

    # ---------------- apply ----------------

    def mult(self, x: Vec, y: Vec):
        """y <- A x (matrix.c:2696)."""
        y.array = self.op().mult(x.array)
        config.log().log_flops("MatMult", 2 * self.nnz() if hasattr(self, "nnz") else 0)
        return y

    def multAdd(self, x: Vec, v: Vec, y: Vec):
        y.array = self.op().mult(x.array) + v.array
        return y

    def multTranspose(self, x: Vec, y: Vec):
        op = self.op()
        if op.mult_t is None:
            raise NotImplementedError(f"{type(self).__name__} has no transpose apply")
        y.array = op.mult_t(x.array)
        return y

    def getDiagonal(self, d: Vec | None = None) -> Vec:
        op = self.op()
        if op.diag is None:
            raise NotImplementedError
        if d is None:
            d = self.createVecLeft()
        dv = op.diag()
        if getattr(dv, "ndim", 1) == 0:
            # constant-stencil operators carry a scalar diagonal
            import jax.numpy as jnp
            dv = jnp.broadcast_to(dv, (d.array.shape[0],))
        d.array = dv
        return d

    # ---------------- vectors ----------------

    def createVecs(self):
        return self.createVecRight(), self.createVecLeft()

    def createVecRight(self) -> Vec:
        v = Vec(self.comm)
        v.setLayout(self.col_layout)
        v.setUp()
        return v

    def createVecLeft(self) -> Vec:
        v = Vec(self.comm)
        v.setLayout(self.row_layout)
        v.setUp()
        return v

    # ---------------- nullspaces ----------------

    def getFactor(self, solver_type="petsc", factor_kind="lu"):
        """MatGetFactor (matrix.c): pluggable factorization backends. The
        built-in backend covers lu/ilu/cholesky/icc via the framework's
        host factorizations + device trisolve; external MatSolverTypes
        (mumps/superlu/...) are out of scope but route through this same
        call, preserving the reference's plug-in surface."""
        from .factorctx import FactorContext
        return FactorContext(self, solver_type, factor_kind)

    def setNullSpace(self, ns):
        self.nullspace = ns

    def setNearNullSpace(self, ns):
        self.near_nullspace = ns

    def getNearNullSpace(self):
        return self.near_nullspace

    def setOption(self, name, flag=True):
        if name in ("symmetric", "spd"):
            self.symmetric = bool(flag)

    def view(self, viewer=None):
        m, n = self.getSize()
        print(f"Mat Object: type: {type(self).__name__.lower()}")
        print(f"  rows={m}, cols={n}")


class MatShell(Mat):
    """Matrix-free operator: any traceable callable (MATSHELL analog,
    reference src/mat/impls/shell). The TPU idiom: `lambda x: ...` over
    jnp arrays IS an operator."""

    def __init__(self, comm=None, **kw):
        super().__init__(comm, **kw)
        self._handle = None
        self._context = None

    def setShellOperations(self, mult, mult_transpose=None, diag=None, context=None):
        fns = {"mult": mult if context is not None else (lambda ctx, x: mult(x))}
        if mult_transpose is not None:
            fns["mult_t"] = mult_transpose
        if diag is not None:
            fns["diag"] = diag
        # normalize: shell binder calls mult(ctx, x) when ctx is not None
        if context is None:
            fns["mult"] = mult
        self._handle = operator.register_shell(
            {"mult": fns["mult"], "mult_t": fns.get("mult_t"), "diag": fns.get("diag")})
        self._context = context
        self._assembled = True
        return self

    @property
    def meta(self):
        return ("shell", self._handle)

    def device_data(self):
        return self._context


class MatDense(Mat):
    """Dense matrix (MATDENSE analog, src/mat/impls/dense) — jnp-native;
    used for coarse-grid direct solves and LMVM-style compact operators."""

    def __init__(self, comm=None, **kw):
        super().__init__(comm, **kw)
        self._a = None

    def setDenseArray(self, a):
        a = np.asarray(a)
        rl, cl = self.row_layout, self.col_layout
        ap = np.zeros((rl.Npad, cl.Npad), dtype=config.real_dtype())
        ap[: a.shape[0], : a.shape[1]] = a
        self._a = jnp.asarray(ap)
        self._assembled = True
        self.increase_state()
        return self

    def getDenseArray(self):
        return np.asarray(self._a[: self.row_layout.N, : self.col_layout.N])

    @property
    def meta(self):
        return ("dense", self.row_layout.Npad, self.col_layout.Npad)

    def device_data(self):
        return {"a": self._a}

    def norm(self, norm_type=NormType.NORM_FROBENIUS):
        a = self.getDenseArray()
        if norm_type == NormType.NORM_FROBENIUS:
            return float(np.linalg.norm(a))
        if norm_type == NormType.NORM_1:
            return float(np.abs(a).sum(axis=0).max())
        if norm_type == NormType.NORM_INFINITY:
            return float(np.abs(a).sum(axis=1).max())
        raise ValueError(norm_type)


def _bind_dense(meta, data):
    a = data["a"]
    return operator.Op(
        mult=lambda x: a @ x,
        mult_t=lambda x: a.T @ x,
        diag=lambda: jnp.diagonal(a),
    )


operator.register_binder("dense", _bind_dense)


class MatNullSpace:
    """Near-nullspace container (reference src/mat/interface/matnull.c) —
    holds the vectors GAMG's tentative prolongator QR consumes."""

    def __init__(self, constant=True, vectors=()):
        self.has_constant = bool(constant)
        self.vectors = list(vectors)

    def as_dense(self, n):
        """Stack into an (n, k) numpy block, constant column first."""
        cols = []
        if self.has_constant:
            cols.append(np.full((n,), 1.0))
        for v in self.vectors:
            cols.append(np.asarray(v.getArray() if isinstance(v, Vec) else v))
        return np.stack(cols, axis=1) if cols else np.ones((n, 1))

    @staticmethod
    def createRigidBody(coords: np.ndarray):
        """Rigid-body modes for elasticity (MatNullSpaceCreateRigidBody).
        coords: (npoints, dim) → 3 modes (2-D) or 6 modes (3-D)."""
        coords = np.asarray(coords)
        npts, dim = coords.shape
        if dim == 2:
            modes = np.zeros((npts * 2, 3))
            modes[0::2, 0] = 1.0
            modes[1::2, 1] = 1.0
            modes[0::2, 2] = -coords[:, 1]
            modes[1::2, 2] = coords[:, 0]
        elif dim == 3:
            modes = np.zeros((npts * 3, 6))
            for d in range(3):
                modes[d::3, d] = 1.0
            x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
            modes[1::3, 3] = -z; modes[2::3, 3] = y   # rot x
            modes[0::3, 4] = z;  modes[2::3, 4] = -x  # rot y
            modes[0::3, 5] = -y; modes[1::3, 5] = x   # rot z
        else:
            raise ValueError(dim)
        ns = MatNullSpace(constant=False)
        ns._dense = modes
        return ns

    def dense_or(self, n):
        if hasattr(self, "_dense"):
            return self._dense
        return self.as_dense(n)


__all__ = ["Mat", "MatShell", "MatDense", "MatNullSpace", "MatStructure",
           "InsertMode", "NormType"]
