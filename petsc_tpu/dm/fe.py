"""DT / PetscFE / PetscDS — quadrature, tabulated finite elements, and
pointwise-weak-form assembly.

Behavioral reference: src/dm/dt (PetscDTGaussJacobiQuadrature dt.c,
PetscQuadrature), PetscSpace/PetscDualSpace/PetscFE (tabulated basis +
derivatives at quadrature points), and PetscDS's pointwise residual
kernels f0(u, ∇u, x) (test-function term) and f1(u, ∇u, x) (test-gradient
term) with the Jacobian blocks g0..g3 (plexfem.c assembly loops).

TPU redesign: tabulation is tiny host numpy; ASSEMBLY is one vmapped jax
kernel over the cell batch — element solution gather, reference-gradient
push-forward, the user's pointwise f0/f1 evaluated at every quadrature
point of every cell at once, quadrature-weighted contraction with the
tabulated basis, scatter-add. Jacobians come from jax.jacfwd of the very
same element kernel (no hand-coded g0..g3 needed — they're derived), so
any residual form gets an exact consistent tangent.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------
# quadrature (PetscDTGaussJacobiQuadrature role)
# ---------------------------------------------------------------------

def gauss_quadrature(dim, npoints_1d, cell="simplex"):
    """Quadrature (points, weights) on the reference cell.
    simplex dim 2: degree-exact Dunavant rules (1, 3, 6 pts);
    tensor cells: Gauss-Legendre products."""
    if cell == "tensor" or dim == 1:
        x, w = np.polynomial.legendre.leggauss(npoints_1d)
        x = 0.5 * (x + 1.0)         # [0,1]
        w = 0.5 * w
        if dim == 1:
            return x[:, None], w
        pts = np.array(np.meshgrid(*([x] * dim), indexing="ij"))
        pts = pts.reshape(dim, -1).T
        ww = w
        for _ in range(dim - 1):
            ww = np.outer(ww, w).reshape(-1)
        return pts, ww
    if dim == 2:
        if npoints_1d <= 1:          # degree 1
            return np.array([[1 / 3, 1 / 3]]), np.array([0.5])
        if npoints_1d == 2:          # degree 2 (3-point)
            return (np.array([[1 / 6, 1 / 6], [2 / 3, 1 / 6],
                              [1 / 6, 2 / 3]]),
                    np.array([1 / 6, 1 / 6, 1 / 6]))
        # degree 4 (6-point Dunavant)
        a, b = 0.445948490915965, 0.091576213509771
        pts = np.array([[a, a], [1 - 2 * a, a], [a, 1 - 2 * a],
                        [b, b], [1 - 2 * b, b], [b, 1 - 2 * b]])
        wa, wb = 0.111690794839005, 0.054975871827661
        return pts, np.array([wa, wa, wa, wb, wb, wb])
    raise NotImplementedError(f"quadrature dim={dim} cell={cell}")


# ---------------------------------------------------------------------
# tabulated spaces (PetscSpace/PetscFE role)
# ---------------------------------------------------------------------

class FE:
    """A tabulated scalar finite element on the reference cell: basis
    values B (nq, nb) and reference gradients D (nq, nb, dim) at the
    quadrature points (PetscFEGetCellTabulation)."""

    def __init__(self, name, dim, nb, quad, B, D, dof_kind):
        self.name = name
        self.dim = dim
        self.nb = nb
        self.qp, self.qw = quad
        self.B = B
        self.D = D
        self.dof_kind = dof_kind    # "vertex" | "vertex+edge"

    @classmethod
    def create(cls, kind, qdeg=2):
        """kind: 'p1' (linear tri), 'p2' (quadratic tri), 'q1' (bilinear
        quad)."""
        if kind == "p1":
            qp, qw = gauss_quadrature(2, qdeg)
            x, y = qp[:, 0], qp[:, 1]
            B = np.stack([1 - x - y, x, y], axis=1)
            D = np.broadcast_to(
                np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]]),
                (len(qp), 3, 2)).copy()
            return cls("p1", 2, 3, (qp, qw), B, D, "vertex")
        if kind == "p2":
            qp, qw = gauss_quadrature(2, 3)
            x, y = qp[:, 0], qp[:, 1]
            l0, l1, l2 = 1 - x - y, x, y
            B = np.stack([l0 * (2 * l0 - 1), l1 * (2 * l1 - 1),
                          l2 * (2 * l2 - 1), 4 * l0 * l1, 4 * l1 * l2,
                          4 * l0 * l2], axis=1)
            dl = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
            D = np.zeros((len(qp), 6, 2))
            for q in range(len(qp)):
                lam = np.array([l0[q], l1[q], l2[q]])
                for d in range(2):
                    D[q, 0, d] = (4 * lam[0] - 1) * dl[0, d]
                    D[q, 1, d] = (4 * lam[1] - 1) * dl[1, d]
                    D[q, 2, d] = (4 * lam[2] - 1) * dl[2, d]
                    D[q, 3, d] = 4 * (lam[1] * dl[0, d] + lam[0] * dl[1, d])
                    D[q, 4, d] = 4 * (lam[2] * dl[1, d] + lam[1] * dl[2, d])
                    D[q, 5, d] = 4 * (lam[2] * dl[0, d] + lam[0] * dl[2, d])
            return cls("p2", 2, 6, (qp, qw), B, D, "vertex+edge")
        if kind == "q1":
            qp, qw = gauss_quadrature(2, qdeg, cell="tensor")
            x, y = qp[:, 0], qp[:, 1]
            B = np.stack([(1 - x) * (1 - y), x * (1 - y),
                          (1 - x) * y, x * y], axis=1)
            D = np.stack([
                np.stack([-(1 - y), -(1 - x)], axis=1),
                np.stack([(1 - y), -x], axis=1),
                np.stack([-y, (1 - x)], axis=1),
                np.stack([y, x], axis=1)], axis=1)
            return cls("q1", 2, 4, (qp, qw), B, D, "vertex")
        raise KeyError(kind)


def build_edges(cells):
    """Edge numbering for P2 dofs: returns (edges (ne,2) sorted vertex
    pairs, cell2edge (ncell, 3) in local order (01, 12, 02))."""
    pairs = [(0, 1), (1, 2), (0, 2)]
    emap = {}
    c2e = np.zeros((len(cells), 3), dtype=np.int64)
    for c, cell in enumerate(cells):
        for k, (a, b) in enumerate(pairs):
            key = tuple(sorted((int(cell[a]), int(cell[b]))))
            if key not in emap:
                emap[key] = len(emap)
            c2e[c, k] = emap[key]
    edges = np.asarray(sorted(emap, key=emap.get), dtype=np.int64)
    return edges, c2e


class DS:
    """PetscDS role: assemble residual/Jacobian from pointwise weak forms

        F_v = sum_q w_q |J| [ f0(u, gu, x) B[q,v] + f1(u, gu, x) . gD[q,v] ]

    with f0 scalar and f1 a dim-vector, both pure jax functions. The cell
    loop is vmapped; the element Jacobian is jax.jacfwd of the SAME
    kernel."""

    def __init__(self, plex, fe: FE):
        self.fe = fe
        self.cells = np.asarray(plex.cells, dtype=np.int64)
        self.coords = np.asarray(plex.coords, dtype=np.float64)
        nv = len(self.coords)
        if fe.dof_kind == "vertex+edge":
            self.edges, c2e = build_edges(self.cells)
            self.conn = np.concatenate([self.cells, nv + c2e], axis=1)
            self.ndof = nv + len(self.edges)
            # P2 node coordinates (vertices + midpoints) for BC detection
            mids = 0.5 * (self.coords[self.edges[:, 0]]
                          + self.coords[self.edges[:, 1]])
            self.dof_coords = np.vstack([self.coords, mids])
        else:
            self.conn = self.cells
            self.ndof = nv
            self.dof_coords = self.coords
        self.f0 = None
        self.f1 = None

    def setResidual(self, f0=None, f1=None):
        """f0(u, gu, x) -> scalar; f1(u, gu, x) -> (dim,) vector."""
        self.f0 = f0
        self.f1 = f1
        return self

    def _element_kernel(self):
        fe = self.fe
        B = jnp.asarray(fe.B)
        Dref = jnp.asarray(fe.D)
        qw = jnp.asarray(fe.qw)
        f0 = self.f0 or (lambda u, gu, x: 0.0)
        f1 = self.f1 or (lambda u, gu, x: jnp.zeros(fe.dim))
        vtx = self.cells.shape[1]

        def element(ue, xe):
            # affine simplex map from the vertex coords (first vtx rows)
            J = jnp.stack([xe[1] - xe[0], xe[2] - xe[0]], axis=1) \
                if vtx == 3 else None
            detJ = jnp.abs(jnp.linalg.det(J))
            Jinv = jnp.linalg.inv(J)
            gD = jnp.einsum("qbd,de->qbe", Dref, Jinv)   # phys gradients
            uq = B @ ue                                  # (nq,)
            guq = jnp.einsum("qbe,b->qe", gD, ue)        # (nq, dim)
            # quadrature-point physical coords via the P1 vertex map
            lam = jnp.concatenate(
                [1 - jnp.asarray(fe.qp).sum(axis=1, keepdims=True),
                 jnp.asarray(fe.qp)], axis=1)
            xq = lam @ xe
            f0q = jax.vmap(f0)(uq, guq, xq)              # (nq,)
            f1q = jax.vmap(f1)(uq, guq, xq)              # (nq, dim)
            wdet = qw * detJ
            Fv = jnp.einsum("q,qv->v", wdet * f0q, B) \
                + jnp.einsum("q,qe,qve->v", wdet, f1q, gD)
            return Fv

        return element

    def assembleResidual(self, u):
        """Global residual F(u) (no boundary conditions applied)."""
        element = self._element_kernel()
        conn = jnp.asarray(self.conn)
        xe_all = jnp.asarray(self.coords)[jnp.asarray(self.cells)]
        ue_all = jnp.asarray(u)[conn]
        Fe = jax.vmap(element)(ue_all, xe_all)           # (ncell, nb)
        F = jnp.zeros(self.ndof, Fe.dtype)
        return F.at[conn.reshape(-1)].add(Fe.reshape(-1))

    def assembleJacobian(self, u):
        """Global sparse Jacobian dF/du by batched jacfwd of the element
        kernel (exact tangent of the registered weak form)."""
        import scipy.sparse as sp
        element = self._element_kernel()
        conn = self.conn
        xe_all = jnp.asarray(self.coords)[jnp.asarray(self.cells)]
        ue_all = jnp.asarray(u)[jnp.asarray(conn)]
        Ke = np.asarray(jax.vmap(jax.jacfwd(element))(ue_all, xe_all))
        nb = self.fe.nb
        rows = np.repeat(conn, nb, axis=1).reshape(-1)
        cols = np.tile(conn, (1, nb)).reshape(-1)
        A = sp.csr_matrix((Ke.reshape(-1), (rows, cols)),
                          shape=(self.ndof, self.ndof))
        A.sum_duplicates()
        return A

    def boundary_dofs(self, predicate):
        """Dof ids whose coordinates satisfy predicate(x) (DMAddBoundary
        essential-BC role)."""
        mask = np.asarray([bool(predicate(x)) for x in self.dof_coords])
        return np.where(mask)[0]
