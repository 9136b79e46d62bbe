"""Vec: distributed vectors as sharded jax.Arrays.

TPU-native re-design of PETSc's Vec (reference: _VecOps vtable
include/petsc/private/vecimpl.h:18-113; BLAS-1 ops
src/vec/vec/interface/rvector.c — VecAXPY :663, VecDot :108, VecNorm :199;
MPI reductions src/vec/vec/impls/mpi/pvec2.c:7). There is no Seq/MPI/CUDA
split: one implementation holds a (possibly sharded) jax.Array in HBM, XLA
emits the psum for reductions, and nshards=1 is the degenerate case.

Storage is the padded global space of the Layout (shape (Npad,)); the
framework maintains a **zero-tail invariant** (padding entries are always 0)
so dot/norm/sum need no masking. Ops that would break it (set, shift, exp,
reciprocal, setRandom) re-zero the tail explicitly.

The petsc4py method surface (camelCase) is kept so reference users can
switch without relearning the API.
"""

from __future__ import annotations

from enum import IntEnum

import jax
import jax.numpy as jnp

from ..ops.reduce import fdot
import numpy as np

from .. import config
from ..parallel.layout import Layout
from ..parallel.mesh import Comm, comm_self
from ..sys.object import PObject


class NormType(IntEnum):  # include/petscvec.h NormType values
    NORM_1 = 0
    NORM_2 = 1
    NORM_FROBENIUS = 2
    NORM_INFINITY = 3
    NORM_1_AND_2 = 4


class InsertMode(IntEnum):  # include/petscsystypes.h InsertMode
    NOT_SET_VALUES = 0
    INSERT_VALUES = 1
    ADD_VALUES = 2
    MAX_VALUES = 3
    MIN_VALUES = 4


def _mask_iota(n):
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]


class Vec(PObject):
    _class_name = "Vec"

    def __init__(self, comm: Comm | None = None, **kw):
        super().__init__(**kw)
        self.comm = comm or comm_self()
        self.layout: Layout | None = None
        self._array: jax.Array | None = None
        self._type = "standard"

    # ---------------- creation ----------------

    @classmethod
    def create(cls, comm=None):
        return cls(comm)

    def setSizes(self, N: int, bs: int = 1):
        self.layout = Layout(int(N), self.comm.nshards, bs=bs, axis=self.comm.axis)
        return self

    def setLayout(self, layout: Layout):
        self.layout = layout
        return self

    def setType(self, t):
        self._type = t
        return self

    def setFromOptions(self):
        return self

    def setUp(self):
        if self._array is None:
            self._array = self._zeros()
        self._setup_called = True
        return self

    def _zeros(self):
        a = jnp.zeros((self.layout.Npad,), dtype=config.real_dtype())
        return self._shard(a)

    def _shard(self, a):
        if self.comm.nshards > 1:
            a = jax.device_put(a, self.comm.row_sharding())
        return a

    @classmethod
    def from_array(cls, arr, comm=None, layout=None):
        """Create from a dense global array of logical length N."""
        v = cls(comm)
        arr = np.asarray(arr)
        if layout is None:
            layout = Layout(arr.shape[0], v.comm.nshards, axis=v.comm.axis)
        v.layout = layout
        pad = layout.Npad - arr.shape[0]
        if pad:
            arr = np.concatenate([arr, np.zeros((pad,), dtype=arr.dtype)])
        v._array = v._shard(jnp.asarray(arr, dtype=config.real_dtype()))
        v._setup_called = True
        return v

    def duplicate(self):
        w = Vec(self.comm, options=self._options, prefix=self._prefix)
        w.layout = self.layout
        w._array = self._zeros()
        w._setup_called = True
        return w

    def copy(self, result=None):
        if result is None:
            result = self.duplicate()
        result._array = self._array
        result.increase_state()
        return result

    # ---------------- array access ----------------

    @property
    def array(self) -> jax.Array:
        """The underlying padded device array (shape (Npad,))."""
        if self._array is None:
            self.setUp()
        return self._array

    @array.setter
    def array(self, a):
        self._array = a
        self.increase_state()

    def getArray(self, readonly=True):
        """Logical (unpadded) values as numpy (VecGetArray borrow analog)."""
        return np.asarray(self.array[: self.layout.N])

    def setArray(self, values):
        values = np.asarray(values)
        assert values.shape[0] == self.layout.N
        pad = self.layout.pad
        if pad:
            values = np.concatenate([values, np.zeros((pad,), dtype=values.dtype)])
        self._array = self._shard(jnp.asarray(values, dtype=self.array.dtype))
        self.increase_state()

    def getSize(self):
        return self.layout.N

    def getLocalSize(self):
        return self.layout.block

    def getOwnershipRange(self, shard=None):
        if shard is None:
            return (0, self.layout.N) if self.comm.nshards == 1 else self.layout.range(0)
        return self.layout.range(shard)

    def getBlockSize(self):
        return self.layout.bs

    def _zero_tail(self, a):
        pad = self.layout.pad
        if pad == 0:
            return a
        n = self.layout.Npad
        return jnp.where(_mask_iota(n) < self.layout.N, a, jnp.zeros((), a.dtype))

    # ---------------- setting values ----------------

    def set(self, alpha):
        self._array = self._zero_tail(jnp.full_like(self.array, alpha))
        self.increase_state()
        return self

    def zeroEntries(self):
        return self.set(0.0)

    def setValues(self, idx, values, addv=InsertMode.INSERT_VALUES):
        idx = jnp.asarray(idx, dtype=jnp.int64)
        values = jnp.asarray(values, dtype=self.array.dtype)
        if addv == InsertMode.ADD_VALUES:
            self._array = self.array.at[idx].add(values)
        else:
            self._array = self.array.at[idx].set(values)
        self.increase_state()

    def setValue(self, i, v, addv=InsertMode.INSERT_VALUES):
        self.setValues(jnp.asarray([i]), jnp.asarray([v]), addv)

    def assemblyBegin(self):
        pass  # global-indexed device scatter: no stash needed

    def assemblyEnd(self):
        pass

    def setRandom(self, key=None, interval=(0.0, 1.0)):
        if key is None:
            key = jax.random.PRNGKey(0)
        lo, hi = interval
        a = jax.random.uniform(key, (self.layout.Npad,), dtype=self.array.dtype,
                               minval=lo, maxval=hi)
        self._array = self._zero_tail(self._shard(a))
        self.increase_state()
        return self

    # ---------------- BLAS-1 ----------------

    def axpy(self, alpha, x: "Vec"):
        """y <- alpha x + y (rvector.c:663)."""
        self._array = self.array + alpha * x.array
        config.log().log_flops("VecAXPY", 2 * self.layout.N)
        self.increase_state()
        return self

    def aypx(self, alpha, x: "Vec"):
        """y <- x + alpha y."""
        self._array = x.array + alpha * self.array
        self.increase_state()
        return self

    def axpby(self, alpha, beta, x: "Vec"):
        """y <- alpha x + beta y."""
        self._array = alpha * x.array + beta * self.array
        self.increase_state()
        return self

    def waxpy(self, alpha, x: "Vec", y: "Vec"):
        """self <- alpha x + y."""
        self._array = alpha * x.array + y.array
        self.increase_state()
        return self

    def maxpy(self, alphas, xs):
        """y <- y + sum_i alpha_i x_i."""
        a = self.array
        for alpha, x in zip(alphas, xs):
            a = a + alpha * x.array
        self._array = a
        self.increase_state()
        return self

    def scale(self, alpha):
        self._array = self.array * alpha
        self.increase_state()
        return self

    def shift(self, alpha):
        self._array = self._zero_tail(self.array + alpha)
        self.increase_state()
        return self

    def dot(self, y: "Vec"):
        """x'y; zero tail makes padding harmless (VecDot_MPI pvec2.c:7 — the
        psum is emitted by XLA for sharded arrays)."""
        config.log().log_flops("VecDot", 2 * self.layout.N)
        return float(fdot(self.array, y.array))

    def tDot(self, y: "Vec"):
        return float(fdot(self.array, y.array))

    def norm(self, norm_type=NormType.NORM_2):
        a = self.array
        if norm_type == NormType.NORM_2 or norm_type == NormType.NORM_FROBENIUS:
            config.log().log_flops("VecNorm", 2 * self.layout.N)
            return float(jnp.sqrt(fdot(a, a)))
        if norm_type == NormType.NORM_1:
            return float(jnp.sum(jnp.abs(a)))
        if norm_type == NormType.NORM_INFINITY:
            return float(jnp.max(jnp.abs(a)))
        if norm_type == NormType.NORM_1_AND_2:
            return (float(jnp.sum(jnp.abs(a))), float(jnp.sqrt(fdot(a, a))))
        raise ValueError(norm_type)

    def normalize(self):
        n = self.norm()
        if n > 0:
            self.scale(1.0 / n)
        return n

    def sum(self):
        return float(jnp.sum(self.array))

    def mean(self):
        return self.sum() / self.layout.N

    def _masked(self, fill):
        a = self.array
        if self.layout.pad == 0:
            return a
        return jnp.where(_mask_iota(self.layout.Npad) < self.layout.N, a,
                         jnp.full((), fill, a.dtype))

    def max(self):
        a = self._masked(-jnp.inf)
        i = int(jnp.argmax(a))
        return i, float(a[i])

    def min(self):
        a = self._masked(jnp.inf)
        i = int(jnp.argmin(a))
        return i, float(a[i])

    # ---------------- pointwise ----------------

    def pointwiseMult(self, x: "Vec", y: "Vec"):
        self._array = x.array * y.array
        self.increase_state()
        return self

    def pointwiseDivide(self, x: "Vec", y: "Vec"):
        self._array = self._zero_tail(x.array / y.array)
        self.increase_state()
        return self

    def pointwiseMax(self, x: "Vec", y: "Vec"):
        self._array = jnp.maximum(x.array, y.array)
        self.increase_state()
        return self

    def pointwiseMin(self, x: "Vec", y: "Vec"):
        self._array = jnp.minimum(x.array, y.array)
        self.increase_state()
        return self

    def maxPointwiseDivide(self, y: "Vec"):
        r = jnp.abs(self.array) / jnp.where(y.array == 0, 1.0, jnp.abs(y.array))
        return float(jnp.max(r))

    def reciprocal(self):
        """x_i <- 1/x_i, leaving zero entries zero (PETSc semantics)."""
        a = self.array
        self._array = jnp.where(a != 0, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
        self.increase_state()
        return self

    def abs(self):
        self._array = jnp.abs(self.array)
        self.increase_state()
        return self

    def sqrtabs(self):
        self._array = jnp.sqrt(jnp.abs(self.array))
        self.increase_state()
        return self

    def exp(self):
        self._array = self._zero_tail(jnp.exp(self.array))
        self.increase_state()
        return self

    def log(self):
        a = self.array
        self._array = self._zero_tail(jnp.log(jnp.where(a <= 0, 1.0, a)))
        self.increase_state()
        return self

    # ---------------- viewing / IO ----------------

    def view(self, viewer=None):
        vals = self.getArray()
        print(f"Vec Object: 1 MPI process" if self.comm.nshards == 1
              else f"Vec Object: {self.comm.nshards} shards")
        print("  type: petsc_tpu")
        for v in vals:
            print(f"{v:g}")

    def axpbypcz(self, alpha, beta, gamma, x: "Vec", y: "Vec"):
        """self = alpha x + beta y + gamma self (VecAXPBYPCZ)."""
        self.array = alpha * x.array + beta * y.array + gamma * self.array
        return self

    def swap(self, other: "Vec"):
        """VecSwap: exchange contents."""
        self.array, other.array = other.array, self.array
        return self

    def dotNorm2(self, other: "Vec"):
        """VecDotNorm2: (self . other, ||other||^2) fused — one pass /
        one psum pair (used by BiCGStab variants)."""
        import jax.numpy as jnp
        a = self.array
        b = other.array
        return (float(fdot(b, a).real), float(fdot(b, b).real))

    def getSubVector(self, iset):
        """VecGetSubVector: gathered copy at the index set (restore with
        restoreSubVector to write back — borrow semantics)."""
        import numpy as np
        idx = np.asarray(iset.indices if hasattr(iset, "indices")
                         else iset, dtype=np.int64)
        sub = Vec.from_array(np.asarray(self.getArray())[idx],
                             comm=self.comm)
        sub._parent_idx = (self, idx)
        return sub

    def restoreSubVector(self, iset, sub: "Vec"):
        import numpy as np
        idx = np.asarray(iset.indices if hasattr(iset, "indices")
                         else iset, dtype=np.int64)
        full = np.asarray(self.getArray()).copy()
        full[idx] = np.asarray(sub.getArray())[: len(idx)]
        self.setArray(full)
        return self

    def strideGather(self, field, bs=None):
        """VecStrideGather: component `field` of a bs-interlaced vector."""
        import numpy as np
        bs = bs or self.getBlockSize() or 1
        a = np.asarray(self.getArray())[: self.getSize()]
        return Vec.from_array(a[field::bs], comm=self.comm)

    def strideScatter(self, field, sub: "Vec", bs=None):
        import numpy as np
        bs = bs or self.getBlockSize() or 1
        a = np.asarray(self.getArray())[: self.getSize()].copy()
        a[field::bs] = np.asarray(sub.getArray())[: len(a[field::bs])]
        self.setArray(a)
        return self

    def strideNorm(self, field, norm_type=None, bs=None):
        return self.strideGather(field, bs=bs).norm(
            *(() if norm_type is None else (norm_type,)))

    def equal(self, other: "Vec"):
        return bool(jnp.all(self.array == other.array))

    def __repr__(self):
        return f"Vec(N={self.layout.N if self.layout else None}, nshards={self.comm.nshards})"


def _split_phase(self, kind, other=None):
    st = self.__dict__.setdefault("_split_reqs", [])
    st.append((kind, other))
    return self


def _split_phase_end(self):
    reqs = self.__dict__.get("_split_reqs", [])
    if not reqs:
        return None
    # one fused pass: all reductions computed together (comb.c role —
    # XLA emits a single fused reduction/psum)
    outs = []
    for kind, other in reqs:
        if kind == "dot":
            outs.append(self.dot(other))
        else:
            outs.append(self.norm())
    self._split_reqs = []
    return outs if len(outs) > 1 else outs[0]


Vec.dotBegin = lambda self, y: _split_phase(self, "dot", y)
Vec.normBegin = lambda self, *a: _split_phase(self, "norm")
Vec.dotEnd = lambda self, *a: _split_phase_end(self)
Vec.normEnd = lambda self, *a: _split_phase_end(self)


def fused_reductions(pairs):
    """Split-phase reduction batching (reference src/vec/vec/utils/comb.c:9):
    compute several dots/norms with ONE device round-trip. `pairs` is a list
    of ("dot", x, y) / ("norm2", x) / ("norm1", x) / ("norminf", x) tuples;
    returns a list of floats in order.
    """
    parts = []
    for p in pairs:
        kind = p[0]
        if kind == "dot":
            parts.append(fdot(p[1].array, p[2].array))
        elif kind == "norm2":
            parts.append(fdot(p[1].array, p[1].array))
        elif kind == "norm1":
            parts.append(jnp.sum(jnp.abs(p[1].array)))
        elif kind == "norminf":
            parts.append(jnp.max(jnp.abs(p[1].array)))
        else:
            raise ValueError(kind)
    stacked = jnp.stack(parts)  # one fused program, one sync
    out = np.asarray(stacked)
    res = []
    for p, v in zip(pairs, out):
        res.append(float(np.sqrt(v)) if p[0] == "norm2" else float(v))
    return res
