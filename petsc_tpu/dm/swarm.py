"""DMSwarm: particle ("swarm") data management + PIC coupling to a mesh.

Behavioral reference: src/dm/impls/swarm (DMSwarmRegisterPetscDatatypeField
swarm.c, DMSwarmMigrate, DMSwarmProjectFields data_ex/swarm_pic.c,
DMSwarmSetCellDM). The reference moves particle structs between ranks with
MPI point-to-point migration.

TPU-first redesign: a swarm is a struct-of-arrays of device arrays (one
(n, bs) array per field), so every PIC operation is a vectorized map:
  - binning particle -> cell on a DMDA is floor-divide + clip (no search),
  - deposition (particle -> grid) is cloud-in-cell scatter-add
    (jnp .at[].add — XLA lowers to sorted-segment-sum on TPU),
  - interpolation (grid -> particle) is the adjoint gather with the same
    weights.
"Migration" in the SPMD single-program model is a stable sort by cell id —
data never leaves the global arrays; shard boundaries are an execution
detail handled by the array sharding, not by explicit sends.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..sys.error import Error
from ..vec.vec import Vec
from .dm import DM


class DMSwarm(DM):
    def __init__(self, comm=None, **kw):
        super().__init__(comm, **kw)
        self._fields: dict[str, int] = {}      # name -> blocksize
        self._data: dict[str, np.ndarray] = {}
        self._n = 0
        self.cell_dm = None
        self.swarm_type = "basic"              # basic | pic

    # ---- setup (swarm.c registration API) ----

    @classmethod
    def create(cls, comm=None):
        sw = cls(comm)
        sw.registerField("DMSwarmPIC_coor", 0)   # placeholder, sized later
        return sw

    def setType(self, t):
        self.swarm_type = t
        return self

    def setCellDM(self, dm):
        self.cell_dm = dm
        if "DMSwarmPIC_coor" in self._fields:
            self._fields["DMSwarmPIC_coor"] = dm.dim
        return self

    def registerField(self, name, bs, dtype=np.float64):
        self._fields[name] = int(bs)
        if self._n and bs:
            self._data[name] = np.zeros((self._n, bs), dtype=dtype)
        return self

    def finalizeFieldRegister(self):
        return self

    def setLocalSizes(self, n, buffer=-1):
        self._n = int(n)
        for name, bs in self._fields.items():
            if bs:
                self._data[name] = np.zeros((self._n, bs))
        return self

    def getLocalSize(self):
        return self._n

    getSize = getLocalSize

    # ---- field access (DMSwarmGetField) ----

    def getField(self, name):
        if name not in self._data:
            raise Error(f"DMSwarm: unknown field '{name}'")
        return self._data[name]

    def restoreField(self, name, arr=None):
        if arr is not None:
            self._data[name] = np.asarray(arr).reshape(self._n, -1)
        return self

    def setPointCoordinates(self, coords):
        coords = np.atleast_2d(np.asarray(coords, dtype=np.float64))
        if self._n != len(coords):
            self.setLocalSizes(len(coords))
        self._fields["DMSwarmPIC_coor"] = coords.shape[1]
        self._data["DMSwarmPIC_coor"] = coords
        return self

    def insertPointsUsingCellDM(self, ppcell=1, layout="regular"):
        """DMSwarmInsertPointsUsingCellDM: ppcell^dim equispaced particles
        per cell of the DMDA cell DM."""
        da = self.cell_dm
        if da is None:
            raise Error("DMSwarm: setCellDM first")
        axes = []
        for ax in range(da.dim):
            ncell = da.sizes[ax] - 1
            pts = (np.arange(ncell * ppcell) + 0.5) / (ncell * ppcell)
            axes.append(pts)
        grids = np.meshgrid(*axes, indexing="ij")
        coords = np.stack([g.reshape(-1) for g in grids], axis=1)
        self.setPointCoordinates(coords)
        return self

    def addNPoints(self, coords):
        coords = np.atleast_2d(coords)
        old = self._data.get("DMSwarmPIC_coor",
                             np.zeros((0, coords.shape[1])))
        self._n += len(coords)
        for name, bs in self._fields.items():
            if name == "DMSwarmPIC_coor":
                self._data[name] = np.vstack([old, coords])
            elif bs:
                cur = self._data.get(name, np.zeros((0, bs)))
                self._data[name] = np.vstack([cur,
                                              np.zeros((len(coords), bs))])
        return self

    def removePoints(self, mask):
        """Remove particles where mask is True (DMSwarmRemovePoint)."""
        keep = ~np.asarray(mask, dtype=bool)
        for name in list(self._data):
            self._data[name] = self._data[name][keep]
        self._n = int(keep.sum())
        return self

    # ---- PIC coupling ----

    def _cell_geometry(self):
        da = self.cell_dm
        if da is None or da.dim is None:
            raise Error("DMSwarm: setCellDM with a DMDA first")
        ncell = np.array([s - 1 for s in da.sizes[: da.dim]])
        h = 1.0 / ncell
        return ncell, h

    def binToCells(self):
        """Cell id per particle on the unit-box DMDA (floor-divide — the
        TPU replacement for DMSwarmMigrate's point location walk)."""
        ncell, h = self._cell_geometry()
        X = self._data["DMSwarmPIC_coor"]
        ij = np.clip((X / h).astype(np.int64), 0, ncell - 1)
        cid = ij[:, 0]
        for ax in range(1, X.shape[1]):
            cid = cid * ncell[ax] + ij[:, ax]
        return cid

    def migrate(self, remove_sent_points=True):
        """Stable sort by owning cell: re-establishes locality so each
        shard's particles touch a contiguous grid slab (the SPMD analog of
        DMSwarmMigrate's rank exchange)."""
        order = np.argsort(self.binToCells(), kind="stable")
        for name in list(self._data):
            self._data[name] = self._data[name][order]
        return self

    def projectFields(self, names, mode="cic"):
        """Particle -> mesh deposition (DMSwarmProjectFields). CIC
        (multilinear) weights; returns one node-based Vec per field,
        normalized by the deposited weight sum per node (the reference's
        pointwise projection)."""
        da = self.cell_dm
        ncell, h = self._cell_geometry()
        X = jnp.asarray(self._data["DMSwarmPIC_coor"])
        dim = X.shape[1]
        g = X / jnp.asarray(h)                       # grid coords
        i0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0,
                      jnp.asarray(ncell - 1))
        frac = g - i0
        nodes_shape = tuple(da.sizes[:dim])
        outs = []
        corners = list(np.ndindex(*([2] * dim)))

        def node_id(idx):
            nid = idx[:, 0]
            for ax in range(1, dim):
                nid = nid * da.sizes[ax] + idx[:, ax]
            return nid

        wsum = jnp.zeros(int(np.prod(nodes_shape)))
        per_corner = []
        for c in corners:
            w = jnp.ones(X.shape[0])
            idx = []
            for ax in range(dim):
                w = w * (frac[:, ax] if c[ax] else (1.0 - frac[:, ax]))
                idx.append(i0[:, ax] + c[ax])
            nid = node_id(jnp.stack(idx, axis=1))
            per_corner.append((nid, w))
            wsum = wsum.at[nid].add(w)
        wsafe = jnp.where(wsum == 0, 1.0, wsum)
        for name in ([names] if isinstance(names, str) else names):
            f = jnp.asarray(self._data[name][:, 0])
            acc = jnp.zeros(int(np.prod(nodes_shape)))
            for nid, w in per_corner:
                acc = acc.at[nid].add(w * f)
            outs.append(Vec.from_array(np.asarray(acc / wsafe),
                                       comm=self.comm))
        return outs[0] if isinstance(names, str) else outs

    def depositSum(self, name):
        """Conservative deposition: raw weighted sums per node (what a
        charge-deposition step needs — total is conserved exactly)."""
        da = self.cell_dm
        ncell, h = self._cell_geometry()
        X = jnp.asarray(self._data["DMSwarmPIC_coor"])
        dim = X.shape[1]
        g = X / jnp.asarray(h)
        i0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0,
                      jnp.asarray(ncell - 1))
        frac = g - i0
        f = jnp.asarray(self._data[name][:, 0])
        acc = jnp.zeros(int(np.prod(da.sizes[:dim])))
        for c in np.ndindex(*([2] * dim)):
            w = jnp.ones(X.shape[0])
            nid = None
            for ax in range(dim):
                w = w * (frac[:, ax] if c[ax] else (1.0 - frac[:, ax]))
                t = i0[:, ax] + c[ax]
                nid = t if nid is None else nid * da.sizes[ax] + t
            acc = acc.at[nid].add(w * f)
        return Vec.from_array(np.asarray(acc), comm=self.comm)

    def interpolateToParticles(self, vec):
        """Mesh -> particle gather with the same CIC weights (adjoint of
        deposition; field evaluation at particle positions)."""
        da = self.cell_dm
        ncell, h = self._cell_geometry()
        X = jnp.asarray(self._data["DMSwarmPIC_coor"])
        dim = X.shape[1]
        g = X / jnp.asarray(h)
        i0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0,
                      jnp.asarray(ncell - 1))
        frac = g - i0
        v = jnp.asarray(vec.getArray())[: int(np.prod(da.sizes[:dim]))]
        out = jnp.zeros(X.shape[0])
        for c in np.ndindex(*([2] * dim)):
            w = jnp.ones(X.shape[0])
            nid = None
            for ax in range(dim):
                w = w * (frac[:, ax] if c[ax] else (1.0 - frac[:, ax]))
                t = i0[:, ax] + c[ax]
                nid = t if nid is None else nid * da.sizes[ax] + t
            out = out + w * v[nid]
        return np.asarray(out)
