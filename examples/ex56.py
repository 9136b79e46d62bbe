"""3-D Q1 (tri-linear hex) displacement-form linear elasticity.

petsc_tpu analog of reference src/ksp/ksp/tutorials/ex56.c: E=1.0,
nu=0.25, unit cube, ne^3 elements, soft inclusion (alpha) inside radius
0.25, bottom-face Dirichlet imposed through the reference's scaled-diagonal
BC element, load (1, 2, 0)*h^2 per node, rigid-body near-nullspace fed to
GAMG. The 24x24 element stiffness is computed here by 2x2x2 Gauss
quadrature (exact for Q1) rather than hardcoded.

Run: python examples/ex56.py -ne 11 -alpha 1e-3 -ksp_type cg -pc_type gamg
"""

import sys

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import petsc_tpu as pt


def q1_hex_stiffness(E=1.0, nu=0.25):
    """24x24 Q1 hexahedral element stiffness on the unit cube, dofs ordered
    (node0_x, node0_y, node0_z, node1_x, ...), nodes in the ex56 order:
    (0,0,0),(1,0,0),(1,1,0),(0,1,0),(0,0,1),(1,0,1),(1,1,1),(0,1,1)."""
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    C = np.zeros((6, 6))
    C[:3, :3] = lam
    C[np.arange(3), np.arange(3)] += 2 * mu
    C[3:, 3:] = np.eye(3) * mu
    # node reference coords
    nodes = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                      [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]],
                     dtype=np.float64)
    g = 0.5 + np.array([-1, 1]) / (2 * np.sqrt(3.0))   # 2-pt Gauss on [0,1]
    K = np.zeros((24, 24))
    for gx in g:
        for gy in g:
            for gz in g:
                # dN/dx for trilinear shape functions at (gx,gy,gz)
                dN = np.zeros((8, 3))
                for a in range(8):
                    xa, ya, za = nodes[a]
                    sx = xa * gx + (1 - xa) * (1 - gx)
                    sy = ya * gy + (1 - ya) * (1 - gy)
                    sz = za * gz + (1 - za) * (1 - gz)
                    dsx = 2 * xa - 1
                    dsy = 2 * ya - 1
                    dsz = 2 * za - 1
                    dN[a] = [dsx * sy * sz, sx * dsy * sz, sx * sy * dsz]
                B = np.zeros((6, 24))
                for a in range(8):
                    bx, by, bz = dN[a]
                    B[0, 3 * a] = bx
                    B[1, 3 * a + 1] = by
                    B[2, 3 * a + 2] = bz
                    B[3, 3 * a] = by
                    B[3, 3 * a + 1] = bx
                    B[4, 3 * a + 1] = bz
                    B[4, 3 * a + 2] = by
                    B[5, 3 * a] = bz
                    B[5, 3 * a + 2] = bx
                K += 0.125 * B.T @ C @ B   # weight = (1/2)^3 per point
    return K


def rigid_body_modes(coords):
    """6 rigid-body modes over (n, 3) coordinates
    (MatNullSpaceCreateRigidBody, matnull.c)."""
    n = coords.shape[0]
    B = np.zeros((3 * n, 6))
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    B[0::3, 0] = 1.0
    B[1::3, 1] = 1.0
    B[2::3, 2] = 1.0
    B[0::3, 3], B[1::3, 3] = -y, x          # rotation about z
    B[1::3, 4], B[2::3, 4] = -z, y          # rotation about x
    B[0::3, 5], B[2::3, 5] = z, -x          # rotation about y
    return B


def assemble(ne, soft_alpha=1e-3):
    NN = ne + 1
    h = 1.0 / ne
    nnode = NN ** 3
    K1 = q1_hex_stiffness() * h            # stiffness scales like h in 3-D
    # BC element (ex56.c DD2): bottom-face dofs (local < 12) decoupled with
    # a 0.1-scaled diagonal
    K2 = K1.copy()
    for i in range(24):
        for j in range(24):
            if i < 12 or j < 12:
                K2[i, j] = 0.1 * K1[i, j] if i == j else 0.0
    # element -> global node ids (natural x-fastest, ex56 id layout)
    ii, jj, kk = np.meshgrid(np.arange(ne), np.arange(ne), np.arange(ne),
                             indexing="ij")
    base = (ii + NN * jj + NN * NN * kk).reshape(-1)
    off = np.array([0, 1, NN + 1, NN,
                    NN * NN, NN * NN + 1, NN * NN + NN + 1, NN * NN + NN])
    conn = base[:, None] + off[None, :]            # (nel, 8)
    # material: soft inclusion by element-center radius
    cx = (ii.reshape(-1) + 0.5) * h - 0.5
    cy = (jj.reshape(-1) + 0.5) * h - 0.5
    cz = (kk.reshape(-1) + 0.5) * h - 0.5
    alpha = np.where(np.sqrt(cx * cx + cy * cy + cz * cz) < 0.25,
                     soft_alpha, 1.0)
    is_bc = (kk.reshape(-1) == 0)
    Ke = np.where(is_bc[:, None, None], K2[None], K1[None]) \
        * alpha[:, None, None]
    # scatter 24x24 blocks: dof ids
    dofs = (conn[:, :, None] * 3 + np.arange(3)[None, None, :]) \
        .reshape(-1, 24)                           # (nel, 24)
    rows = np.repeat(dofs, 24, axis=1).reshape(-1)
    cols = np.tile(dofs, (1, 24)).reshape(-1)
    import scipy.sparse as sp
    A = sp.csr_matrix((Ke.reshape(-1), (rows, cols)),
                      shape=(3 * nnode, 3 * nnode))
    A.sum_duplicates()
    # load: (h^2, 2h^2, 0) per node of each element; BC elements load only
    # their top nodes (ex56.c vv / v2)
    b = np.zeros(3 * nnode)
    ld = np.zeros((len(base), 24))
    ld[:, 0::3] = h * h
    ld[:, 1::3] = 2 * h * h
    ld[is_bc, :12] = 0.0
    np.add.at(b, dofs.reshape(-1), ld.reshape(-1))
    # node coordinates for the rigid-body modes
    gi, gj, gk = np.meshgrid(np.arange(NN), np.arange(NN), np.arange(NN),
                             indexing="ij")
    coords = np.stack([gi, gj, gk], axis=-1).reshape(-1, 3) * h
    # natural ordering: id = i + NN*j + NN^2*k -> index by (i,j,k)
    ids = (gi + NN * gj + NN * NN * gk).reshape(-1)
    cc = np.zeros_like(coords)
    cc[ids] = coords
    return A.tocsr(), b, cc


def main(argv=None, comm=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    opts = pt.options()
    ne = opts.get_int("ne", default=4)
    soft_alpha = opts.get_real("alpha", default=1e-3)

    A_sp, b_np, coords = assemble(ne, soft_alpha)
    A = pt.MatAIJ.from_scipy(A_sp, comm=comm)
    A.setBlockSize(3)
    A.setNearNullSpace(rigid_body_modes(coords))

    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setNormType("unpreconditioned")
    ksp.setTolerances(rtol=opts.get_real("ksp_rtol", default=1e-4),
                      max_it=200)
    ksp.setFromOptions()
    b = pt.Vec.from_array(b_np, comm=comm)
    x = A.createVecRight()
    ksp.solve(b, x)
    r = A.createVecLeft()
    A.mult(x, r)
    r.axpy(-1.0, b)
    print(f"|b-Ax|/|b|={float(r.norm()) / float(b.norm()):e}, "
          f"|b|={float(b.norm()):e}")
    return ksp


if __name__ == "__main__":
    main()
