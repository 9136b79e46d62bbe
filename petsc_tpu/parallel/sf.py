"""ExchangePlan: the communication backend (PetscSF re-imagined for XLA).

Behavioral reference: PetscSF (src/vec/is/sf/ — star forest of leaves ->
roots; PetscSFBcastBegin sf.c:1481 root->leaf, PetscSFReduceBegin
leaf->root with MPI_Op; impls: basic persistent P2P sfbasic.c:352, MPI-3
neighbor sfneighbor.c:9) and VecScatter (vscat.c:1294, typedef'd to SF).

TPU-native redesign: the SF graph is compiled HOST-SIDE into per-neighbor
pack/unpack index tables with uniform (padded) shapes; at run time a Bcast
is, per neighbor offset d, one gather + one `lax.ppermute` (ICI
nearest-neighbor) + one scatter — all inside shard_map, so XLA overlaps
the permutes with unrelated compute (the MatMult_MPIAIJ overlap pattern,
mpiaij.c:1052-1065). Reduce (leaf->root, ADD) runs the same tables in
reverse. When the neighbor set approaches all-to-all the plan lowers to
one all_gather instead (the SF "allgatherv pattern" impl).

Index convention: roots are rows of a Layout (owner = idx // block);
leaves are arbitrary global indices each shard wants (its garray).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .layout import Layout


class ExchangePlan:
    """Per-shard halo gather plan over one mesh axis."""

    def __init__(self, layout: Layout, leaves_per_shard, axis: str = "rows",
                 max_neighbors: int = 8):
        """leaves_per_shard: list (len P) of int arrays of GLOBAL indices
        shard s reads (typically its compacted offdiag columns, garray)."""
        P = layout.nshards
        blk = layout.block
        self.layout = layout
        self.axis = axis
        self.P = P
        self.H = max((len(lv) for lv in leaves_per_shard), default=1) or 1
        # offsets d such that some shard s needs data from shard (s+d) % P
        need = {}
        for s, lv in enumerate(leaves_per_shard):
            owners = np.asarray(lv) // blk
            for t in np.unique(owners):
                d = int((t - s) % P)
                need.setdefault(d, []).append(s)
        self.offsets = sorted(need)
        self.use_allgather = (len(self.offsets) > max_neighbors
                              or P <= 2)
        if self.use_allgather:
            ga = np.zeros((P, self.H), dtype=np.int64)
            for s, lv in enumerate(leaves_per_shard):
                ga[s, : len(lv)] = lv
            self.gidx = ga
            return
        # per-offset pack (sender local rows) and unpack (receiver halo pos)
        self.pack = {}
        self.unpack = {}
        self.counts = {}
        for d in self.offsets:
            Hd = 0
            per_send = []   # sender j packs for receiver (j - d) % P
            per_recv = []   # receiver s scatter positions
            for j in range(P):
                s = (j - d) % P          # receiver
                lv = np.asarray(leaves_per_shard[s])
                owners = lv // blk
                sel = np.nonzero(owners == j)[0]
                local = lv[sel] - j * blk
                per_send.append(local)
                per_recv.append(sel)
                Hd = max(Hd, len(sel))
            Hd = max(Hd, 1)
            pk = np.zeros((P, Hd), dtype=np.int64)
            up = np.full((P, Hd), self.H, dtype=np.int64)  # sentinel drop
            for j in range(P):
                pk[j, : len(per_send[j])] = per_send[j]
                s = (j - d) % P
                up[s, : len(per_recv[j])] = per_recv[j]
            self.pack[d] = pk
            self.unpack[d] = up
            self.counts[d] = Hd

    # ---- device-side tables (stacked per shard, sharded over axis) ----

    def device_tables(self, mesh):
        """Returns a dict of sharded index tables to stash in Mat data."""
        from jax.sharding import NamedSharding, PartitionSpec as Pt
        sh = NamedSharding(mesh, Pt(self.axis, None))
        if self.use_allgather:
            return {"sf_gidx": jax.device_put(jnp.asarray(self.gidx), sh)}
        out = {}
        for d in self.offsets:
            out[f"sf_pack_{d}"] = jax.device_put(
                jnp.asarray(self.pack[d]), sh)
            out[f"sf_unpack_{d}"] = jax.device_put(
                jnp.asarray(self.unpack[d]), sh)
        return out

    def meta(self):
        """Hashable static descriptor for binders."""
        if self.use_allgather:
            return ("sf_allgather", self.P, self.H)
        return ("sf_neighbor", self.P, self.H, tuple(self.offsets),
                tuple(self.counts[d] for d in self.offsets))

    # ---- in-shard_map application (per-shard views, leading dim dropped) ----

    @staticmethod
    def bcast(meta, tables, x_local, axis):
        """Root->leaf: returns (H,) halo values for this shard. Call inside
        shard_map where x_local is this shard's (blk,) block and each table
        row is this shard's (1, Hd) slice."""
        kind = meta[0]
        if kind == "sf_allgather":
            _, P, H = meta
            xg = lax.all_gather(x_local, axis, tiled=True)
            return xg[tables["sf_gidx"][0]]
        _, P, H, offsets, counts = meta
        halo = jnp.zeros((H + 1,), dtype=x_local.dtype)
        for d in offsets:
            buf = x_local[tables[f"sf_pack_{d}"][0]]
            # sender j -> receiver (j - d) % P
            perm = [(j, (j - d) % P) for j in range(P)]
            recv = lax.ppermute(buf, axis, perm)
            halo = halo.at[tables[f"sf_unpack_{d}"][0]].set(recv)
        return halo[:H]

    @staticmethod
    def reduce_add(meta, tables, leaf_vals, blk, axis):
        """Leaf->root ADD: scatter leaf values back to their owners
        (PetscSFReduceBegin with MPIU_SUM). leaf_vals: (H,)."""
        kind = meta[0]
        if kind == "sf_allgather":
            raise NotImplementedError("reduce over allgather plan: use "
                                      "psum_scatter form")
        _, P, H, offsets, counts = meta
        acc = jnp.zeros((blk,), dtype=leaf_vals.dtype)
        lv = jnp.concatenate([leaf_vals, jnp.zeros((1,), leaf_vals.dtype)])
        for d in offsets:
            # receiver s holds contributions at unpack positions; send BACK
            # to owner j = (s + d) % P  => reverse permute
            contrib = lv[tables[f"sf_unpack_{d}"][0]]
            perm = [((j - d) % P, j) for j in range(P)]
            recv = lax.ppermute(contrib, axis, perm)
            acc = acc.at[tables[f"sf_pack_{d}"][0]].add(recv)
        return acc


class VecScatter:
    """Generalized vector gather/scatter (vscat.c): y[iy] = x[ix] across
    layouts. Host-compiled to an ExchangePlan; single-shard fast path is a
    pure gather."""

    def __init__(self, x_layout, ix, y_layout, iy):
        self.ix = np.asarray(ix, dtype=np.int64)
        self.iy = np.asarray(iy, dtype=np.int64)
        self.x_layout = x_layout
        self.y_layout = y_layout

    def apply(self, x, y, addv=False):
        """Single-program apply (device gather; across-shard movement is
        handled by XLA resharding of the gather)."""
        xv = x.array
        vals = xv[jnp.asarray(self.ix)]
        if addv:
            y.array = y.array.at[jnp.asarray(self.iy)].add(vals)
        else:
            y.array = y.array.at[jnp.asarray(self.iy)].set(vals)
        return y

    begin = apply

    def end(self, *a, **kw):
        return None
