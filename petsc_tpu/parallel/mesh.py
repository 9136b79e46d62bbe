"""Device-mesh management: the framework's "communicator".

PETSc objects carry an MPI_Comm; petsc_tpu objects carry a `Comm`, a thin
wrapper over a jax.sharding.Mesh plus the name of the axis rows are
partitioned over. The default Comm is single-device ("COMM_SELF"-like) so all
code paths run unchanged at nshards=1 (reference mpiuni design,
src/sys/mpiuni/mpi.c). Multi-chip runs construct a Comm over all devices
(COMM_WORLD analog) — domain decomposition over the 'rows' axis rides ICI,
a second host axis (DCN) can be added later as a 2-D mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class Comm:
    def __init__(self, mesh: Mesh | None = None, axis: str = "rows"):
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()[:1]), (axis,))
        self.mesh = mesh
        self.axis = axis

    @property
    def size(self) -> int:
        return int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))

    @property
    def nshards(self) -> int:
        """Shards along the row axis. `axis` may be one mesh axis name or a
        TUPLE of axis names — the two-level (DCN host axis x ICI chip axis)
        decomposition of SURVEY §2.12; collectives then ride the flattened
        axis pair (jax collectives accept axis-name sequences)."""
        if isinstance(self.axis, (tuple, list)):
            return int(np.prod([self.mesh.shape[a] for a in self.axis]))
        return int(self.mesh.shape[self.axis])

    def row_sharding(self, ndim=1):
        """NamedSharding partitioning dim 0 over the rows axis."""
        spec = P(self.axis, *([None] * (ndim - 1)))
        return NamedSharding(self.mesh, spec)

    def replicated_sharding(self):
        return NamedSharding(self.mesh, P())

    def pair_class(self, j, k):
        """Classify a neighbor shard pair (flattened row-shard ids):
        'ici' when both ids share every axis coordinate except the LAST
        row axis (same host — the permute rides the fast intra-host
        interconnect), 'dcn' when an outer (host) coordinate differs
        (cross-host traffic). Single-level comms are all-'ici'.
        SURVEY §2.12 two-level halo plans / sfneighbor.c role."""
        axes = self.axis if isinstance(self.axis, (tuple, list)) \
            else (self.axis,)
        if len(axes) == 1:
            return "ici"
        inner = int(self.mesh.shape[axes[-1]])
        return "ici" if (j // inner) == (k // inner) else "dcn"

    def halo_pair_classes(self, offsets=(1, -1)):
        """For each neighbor offset d (slab halo permute j -> (j-d) % P),
        the counts of intra-host ('ici') and cross-host ('dcn') pairs —
        the observable the two-level dryrun asserts on."""
        Pn = self.nshards
        out = {}
        for d in offsets:
            cls = [self.pair_class(j, (j - d) % Pn) for j in range(Pn)]
            out[d] = {"ici": cls.count("ici"), "dcn": cls.count("dcn")}
        return out

    def __repr__(self):
        return f"Comm(axes={dict(self.mesh.shape)}, rows_axis='{self.axis}')"


_comm_self: Comm | None = None
_comm_world: Comm | None = None


def comm_self() -> Comm:
    """Single-device communicator (default for all objects)."""
    global _comm_self
    if _comm_self is None:
        _comm_self = Comm()
    return _comm_self


def comm_world(ndev: int | None = None, axis: str = "rows") -> Comm:
    """Communicator over all (or the first ndev) local devices."""
    global _comm_world
    if _comm_world is None or (ndev is not None and _comm_world.size != ndev):
        devs = jax.devices() if ndev is None else jax.devices()[:ndev]
        _comm_world = Comm(Mesh(np.array(devs), (axis,)), axis)
    return _comm_world


def make_comm(ndev: int, axis: str = "rows") -> Comm:
    devs = jax.devices()[:ndev]
    return Comm(Mesh(np.array(devs), (axis,)), axis)


def make_comm2(hosts: int, chips: int, axes=("dcn", "ici")) -> Comm:
    """Two-level communicator: host (DCN) x chip (ICI) axes, rows sharded
    over the flattened pair (SURVEY §2.12 two-level halo plans). Halo
    ppermutes between adjacent shards on the same host ride ICI; the
    host-boundary pairs cross DCN — exactly the slab decomposition's
    traffic pattern."""
    devs = np.array(jax.devices()[: hosts * chips]).reshape(hosts, chips)
    return Comm(Mesh(devs, tuple(axes)), tuple(axes))
