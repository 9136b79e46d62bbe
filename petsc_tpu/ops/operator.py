"""Operator binding: reconstruct pure apply-functions from (meta, data).

The jit-composability contract of the framework: every Mat/PC exposes
  meta   — a hashable static descriptor (format kind, shapes, options)
  data   — a pytree of device arrays
and `bind(meta, data)` returns an `Op` with pure functions (mult, mult_t,
diag, ...). Solver loops are jitted once per *meta* (static) and re-used for
any operator with the same structure — the TPU analog of PETSc's
symbolic/numeric split (symbolic ≈ meta construction, numeric ≈ data).

This replaces PETSc's function-pointer vtable dispatch
(include/petsc/private/matimpl.h _MatOps): the vtable lookup happens at trace
time, so inside the compiled program there is zero dispatch overhead.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

_BINDERS: dict[str, Callable] = {}


def register_binder(kind: str, binder: Callable):
    _BINDERS[kind] = binder


@dataclass
class Op:
    """Bound operator: pure functions over device arrays."""
    mult: Callable                    # x -> A x
    mult_t: Callable | None = None    # x -> A^T x
    diag: Callable | None = None      # () -> diagonal of A
    meta: tuple | None = None

    def __call__(self, x):
        return self.mult(x)


def bind(meta: tuple, data) -> Op:
    kind = meta[0]
    if kind not in _BINDERS:
        raise KeyError(f"no operator binder registered for kind '{kind}'")
    op = _BINDERS[kind](meta, data)
    op.meta = meta
    return op


# Shell (matrix-free) operators: the callable cannot live in `data` (not a
# pytree leaf), so it is registered here and meta carries the handle.
_SHELLS: dict[int, dict] = {}
_shell_counter = 0


def register_shell(fns: dict) -> int:
    global _shell_counter
    _shell_counter += 1
    _SHELLS[_shell_counter] = fns
    return _shell_counter


def _bind_shell(meta, data):
    _, handle = meta[0], meta[1]
    fns = _SHELLS[handle]
    ctx = data  # optional pytree context threaded to the callable
    mult = fns["mult"]
    return Op(
        mult=(lambda x: mult(ctx, x)) if ctx is not None else mult,
        mult_t=fns.get("mult_t"),
        diag=fns.get("diag"),
    )


register_binder("shell", _bind_shell)
