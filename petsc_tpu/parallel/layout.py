"""Layout: the 1-D block-row partition descriptor.

Reference: PetscLayout (include/petscis.h:319) — {n, N, rstart, rend, range[],
bs} describing how N items split over P ranks. TPU-native redesign: shards are
*uniform* (padded to block = ceil(N/P)) so every per-shard array has the same
static shape — the property XLA/shard_map require. The tail of the last shard
is padding; the framework maintains a zero-tail invariant on vector data so
reductions need no masking, and padded matrix rows are empty so SpMV keeps
the invariant.

A Layout with nshards == 1 has zero padding and adds no overhead — this is
PETSc's "mpiuni" idea (src/sys/mpiuni/mpi.c): one code path at any size.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import numpy as np


def _cdiv(a, b):
    return -(-a // b)


@dataclass(frozen=True)
class Layout:
    N: int                 # global (logical) size
    nshards: int = 1       # partitions along `axis`
    bs: int = 1            # block size (BAIJ-style dof blocking)
    axis: str = "rows"     # mesh axis name this layout is sharded over
    pad_to: int = 1        # round per-shard block up to a multiple (TPU tiling)

    def __post_init__(self):
        if self.N % self.bs:
            raise ValueError(f"global size {self.N} not divisible by block size {self.bs}")

    @cached_property
    def block(self) -> int:
        """Padded per-shard size."""
        blk = _cdiv(self.N, self.nshards)
        m = self.pad_to * self.bs if self.bs > 1 else self.pad_to
        return _cdiv(blk, m) * m if m > 1 else blk

    @property
    def Npad(self) -> int:
        return self.block * self.nshards

    @property
    def pad(self) -> int:
        return self.Npad - self.N

    def range(self, shard: int):
        """Ownership range [rstart, rend) of logical indices for a shard."""
        lo = min(shard * self.block, self.N)
        hi = min((shard + 1) * self.block, self.N)
        return lo, hi

    def owner(self, idx):
        """Owning shard of logical (padded-space) index/indices."""
        return np.asarray(idx) // self.block

    def local_size(self, shard: int) -> int:
        lo, hi = self.range(shard)
        return hi - lo

    @cached_property
    def valid_mask_np(self):
        """Boolean mask over the padded global space marking real entries."""
        return np.arange(self.Npad) < self.N

    def compatible(self, other: "Layout") -> bool:
        return (self.N == other.N and self.nshards == other.nshards
                and self.block == other.block)

    def with_nshards(self, nshards: int) -> "Layout":
        return Layout(self.N, nshards, self.bs, self.axis, self.pad_to)

    def __repr__(self):
        return (f"Layout(N={self.N}, nshards={self.nshards}, block={self.block}, "
                f"pad={self.pad}, bs={self.bs}, axis='{self.axis}')")
