"""Ghosted vectors (VecCreateGhost, src/vec/vec/impls/mpi/commonmpvec.c:31
VecGhostUpdateBegin/End, VecGhostGetLocalForm).

Single-program form: the global vector is one (sharded) array; the local
form appends ghost slots holding copies of other shards' entries. Forward
update = gather (ghosts <- owners), reverse ADD = scatter-add
(owners += ghosts) — the two SF directions."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .vec import InsertMode, Vec


class VecGhost(Vec):
    def __init__(self, comm=None, **kw):
        super().__init__(comm, **kw)
        self._ghosts = None
        self._ghost_vals = None

    @classmethod
    def createGhost(cls, n, ghosts, comm=None):
        v = cls(comm)
        v.setSizes(int(n))
        v.setUp()
        v._ghosts = jnp.asarray(np.asarray(ghosts, dtype=np.int64))
        v._ghost_vals = jnp.zeros((len(v._ghosts),), dtype=v.array.dtype)
        return v

    def getLocalForm(self):
        """Concatenated [owned, ghost] values (VecGhostGetLocalForm)."""
        return jnp.concatenate([self.array, self._ghost_vals])

    def setLocalForm(self, arr):
        n = self.array.shape[0]
        arr = jnp.asarray(arr)
        self.array = arr[:n]
        self._ghost_vals = arr[n:]

    def ghostUpdate(self, addv=InsertMode.INSERT_VALUES, mode="forward"):
        """forward INSERT: ghosts <- owned values (halo refresh);
        reverse ADD: owned += ghost contributions (assembly)."""
        if mode == "forward":
            self._ghost_vals = self.array[self._ghosts]
        elif mode == "reverse":
            if addv == InsertMode.ADD_VALUES:
                self.array = self.array.at[self._ghosts].add(
                    self._ghost_vals)
            else:
                self.array = self.array.at[self._ghosts].set(
                    self._ghost_vals)
            self._ghost_vals = jnp.zeros_like(self._ghost_vals)
        return self

    ghostUpdateBegin = ghostUpdate

    def ghostUpdateEnd(self, *a, **kw):
        return self
