"""Generic multi-field discretization system (PetscDS role).

Behavioral reference: src/dm/dt/interface/dtds.c (N fields, per-field
residual pointwise functions f0/f1 that SEE every field's value and
gradient) and src/dm/impls/plex/plexfem.c's multi-field assembly (the
per-field-pair g0..g3 Jacobian blocks). TPU redesign: the coupled
element residual is ONE jax function over the concatenated element dof
vector, and every Jacobian block — all field pairs at once — comes from
`jax.jacfwd` of it, batched over cells with `vmap`. No hand-coded
g0..g3 kernels: the reference needs them because C cannot
differentiate; autodiff of the residual IS the per-pair block structure.

Scope: affine simplex cells (the CR/P0 Stokes and Taylor-Hood pairs
this replaces bespoke assemblies for); fields are Lagrange (any order,
any ncomp), Crouzeix-Raviart, or P0disc, retabulated on one shared
quadrature. H(div) dual spaces (RT/BDM/Nedelec) keep their bespoke
constructions (fe.py) — their dofs are signed functionals, not nodal
values, and SURVEY scopes Piola-mapped generic assembly out.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..sys.error import Error
from .fe import (DS, crouzeix_raviart_fe, lagrange_fe, p0disc_fe,
                 stroud_conical_quadrature, _det_small, _inv_small)


def _retabulate(fe, qp):
    """(B (nq, nb), D (nq, nb, dim)) of `fe` at the shared quadrature."""
    dim = fe.dim
    if getattr(fe, "order", None) is not None:
        twin = lagrange_fe(dim, fe.order, cell=fe.cell, ncomp=fe.ncomp)
        if twin.nb != fe.nb:
            raise Error("multids: unsupported lagrange variant")
        from .fe import _eval_monomials, _p_monomials
        expo = _p_monomials(dim, fe.order)
        Vn, _ = _eval_monomials(expo, np.asarray(fe.nodes))
        C = np.linalg.inv(Vn)
        Vq, Gq = _eval_monomials(expo, qp)
        return Vq @ C, np.einsum("qmd,mb->qbd", Gq, C)
    if fe.dof_kind == "facet" and dim == 2:            # Crouzeix-Raviart
        x, y = qp[:, 0], qp[:, 1]
        lam = np.stack([1 - x - y, x, y], axis=1)
        gl = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
        opp = (2, 0, 1)
        B = np.stack([1 - 2 * lam[:, opp[k]] for k in range(3)], axis=1)
        D = np.broadcast_to(
            np.stack([-2 * gl[opp[k]] for k in range(3)]),
            (len(qp), 3, 2)).copy()
        return B, D
    if fe.dof_kind == "cell":                          # P0disc
        return (np.ones((len(qp), 1)),
                np.zeros((len(qp), 1, dim)))
    raise Error(f"multids: cannot retabulate element '{fe.name}'")


class MultiDS:
    """N coupled fields over one simplex plex; per-field weak forms see
    ALL fields. Global dof vector = concatenation of per-field blocks
    (field-major — PCFieldSplit ISes are just the block ranges)."""

    def __init__(self, plex, fields, qdeg=None):
        self.plex = plex
        self.names = [nm for nm, _ in fields]
        self.fes = [fe for _, fe in fields]
        dim = self.fes[0].dim
        if getattr(self.fes[0], "cell", "simplex") != "simplex":
            raise Error("multids: simplex meshes only")
        if qdeg is None:
            qdeg = max(max(2 * (getattr(fe, "order", None) or 1), 2)
                       for fe in self.fes)
        self.qp, self.qw = stroud_conical_quadrature(dim, qdeg)
        self.dim = dim
        # per-field layouts via the single-field DS (conn/ndof/coords)
        self.subs = [DS(plex, fe) for fe in self.fes]
        self.tabs = [_retabulate(fe, self.qp) for fe in self.fes]
        self.offsets = np.concatenate(
            [[0], np.cumsum([s.ndof for s in self.subs])])
        self.ndof = int(self.offsets[-1])
        self.f0 = [None] * len(self.fes)
        self.f1 = [None] * len(self.fes)
        # coupled element connectivity: per cell, global dofs of every
        # field's element dofs, field blocks concatenated
        self.conn = np.concatenate(
            [s.conn + off for s, off in zip(self.subs, self.offsets[:-1])],
            axis=1)

    def field_indices(self, name):
        i = self.names.index(name)
        return np.arange(self.offsets[i], self.offsets[i + 1])

    def setResidual(self, name, f0=None, f1=None):
        """Weak form of field `name`: residual contribution
        ∫ f0·v + f1:∇v with f0(u, gu, x), f1(u, gu, x); u/gu are tuples
        over ALL fields (scalar fields: u[i] scalar, gu[i] (dim,);
        ncomp>1: u[i] (nc,), gu[i] (nc, dim))."""
        i = self.names.index(name)
        self.f0[i] = f0
        self.f1[i] = f1
        self._kern = None
        return self

    _kern = None

    def _element_kernel(self):
        if self._kern is not None:
            return self._kern
        dim = self.dim
        nfe = len(self.fes)
        qw = jnp.asarray(self.qw)
        qp = np.asarray(self.qp)
        nq = len(qp)
        lam = jnp.asarray(np.concatenate(
            [1 - qp.sum(axis=1, keepdims=True), qp], axis=1))
        Bs = [jnp.asarray(B) for B, _ in self.tabs]
        Ds = [jnp.asarray(D) for _, D in self.tabs]
        ncs = [getattr(fe, "ncomp", 1) for fe in self.fes]
        nbs = [fe.nb for fe in self.fes]
        splits = np.cumsum([nb * nc for nb, nc in zip(nbs, ncs)])[:-1]
        f0s, f1s = list(self.f0), list(self.f1)

        def element(ue_all, xe):
            J = jnp.stack([xe[i + 1] - xe[0] for i in range(dim)], axis=1)
            dj = _det_small(J)
            detJ = jnp.abs(dj)
            Jinv = _inv_small(J, dj)                  # (d, d)
            xq = lam @ xe[: dim + 1]                  # (nq, d)
            ues = jnp.split(ue_all, splits)
            uqs, guqs, gDs = [], [], []
            for i in range(nfe):
                gD = jnp.einsum("qbd,de->qbe", Ds[i], Jinv)
                gDs.append(gD)
                if ncs[i] == 1:
                    uqs.append(Bs[i] @ ues[i])                 # (nq,)
                    guqs.append(jnp.einsum("qbe,b->qe", gD, ues[i]))
                else:
                    un = ues[i].reshape(nbs[i], ncs[i])
                    uqs.append(Bs[i] @ un)                     # (nq, nc)
                    guqs.append(jnp.einsum("qbe,bc->qce", gD, un))
            wdet = qw * detJ
            parts = []
            for i in range(nfe):
                zf0 = (0.0 if ncs[i] == 1 else jnp.zeros(ncs[i]))
                zf1 = (jnp.zeros(dim) if ncs[i] == 1
                       else jnp.zeros((ncs[i], dim)))
                f0 = f0s[i] or (lambda u, gu, x, z=zf0: z)
                f1 = f1s[i] or (lambda u, gu, x, z=zf1: z)

                def at_q(q, i=i, f0=f0, f1=f1):
                    u = tuple(uq[q] for uq in uqs)
                    gu = tuple(g[q] for g in guqs)
                    return f0(u, gu, xq[q]), f1(u, gu, xq[q])
                f0q, f1q = jax.vmap(at_q)(jnp.arange(nq))
                if ncs[i] == 1:
                    Fv = jnp.einsum("q,qv->v", wdet * f0q, Bs[i]) \
                        + jnp.einsum("q,qe,qve->v", wdet, f1q, gDs[i])
                else:
                    Fv = (jnp.einsum("q,qc,qv->vc", wdet, f0q, Bs[i])
                          + jnp.einsum("q,qce,qve->vc", wdet, f1q,
                                       gDs[i])).reshape(-1)
                parts.append(Fv)
            return jnp.concatenate(parts)

        self._kern = element
        return element

    def _cell_coords(self):
        return jnp.asarray(self.plex.coords)[jnp.asarray(self.plex.cells)]

    def assembleResidual(self, u):
        element = self._element_kernel()
        ue = jnp.asarray(u)[jnp.asarray(self.conn)]
        Fe = np.asarray(jax.vmap(element)(ue, self._cell_coords()))
        F = np.zeros(self.ndof)
        np.add.at(F, self.conn.reshape(-1), Fe.reshape(-1))
        return F

    def assembleJacobian(self, u):
        """Coupled global Jacobian — every per-field-pair block from one
        jacfwd of the concatenated element residual."""
        import scipy.sparse as sp
        element = self._element_kernel()
        ue = jnp.asarray(u)[jnp.asarray(self.conn)]
        Ke = np.asarray(jax.vmap(jax.jacfwd(element))(
            ue, self._cell_coords()))
        nE = self.conn.shape[1]
        rows = np.repeat(self.conn, nE, axis=1).reshape(-1)
        cols = np.tile(self.conn, (1, nE)).reshape(-1)
        return sp.csr_matrix((Ke.reshape(-1), (rows, cols)),
                             shape=(self.ndof, self.ndof))
