"""2-D Stokes flow on a staggered (MAC) grid: DMStag + fieldsplit/Schur.

Role model: the reference's DMStag Stokes demos (src/dm/impls/stag
tutorials): u on vertical faces, v on horizontal faces, p on elements;
-Lap(u) + grad p = f, div u = 0 with homogeneous velocity walls; solved
with FGMRES + PCFieldSplit Schur (selfp), velocity block ILU.

A manufactured solution u = curl(psi), psi = (x(1-x)y(1-y))^2 (velocity
and its gradient vanish on the walls) verifies discretization + solver.

Run: python examples/stokes_stag.py -n 24
"""

import sys

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import petsc_tpu as pt
from petsc_tpu.dm import DMStag


def psi(x, y):
    return (x * (1 - x) * y * (1 - y)) ** 2


def exact_u(x, y):
    # u = d(psi)/dy
    return 2 * (x * (1 - x)) ** 2 * (y * (1 - y)) * (1 - 2 * y)


def exact_v(x, y):
    # v = -d(psi)/dx
    return -2 * (y * (1 - y)) ** 2 * (x * (1 - x)) * (1 - 2 * x)


def _lap4(fn, x, y, h=1e-4):
    return (fn(x + h, y) + fn(x - h, y) + fn(x, y + h) + fn(x, y - h)
            - 4 * fn(x, y)) / h ** 2


def assemble(n):
    """MAC discretization on an n x n element grid. Unknown layout follows
    DMStag stratum offsets: [left_face u (n, n+1), down_face v (n+1, n),
    element p (n, n)] with boundary-face velocities pinned."""
    st = DMStag.create((n, n), (0, 1, 1))
    offs = st.getStratumOffsets()
    off_u, shu, _ = offs["left_face"]    # (n, n+1)
    off_v, shv, _ = offs["down_face"]    # (n+1, n)
    off_p, shp, _ = offs["element"]      # (n, n)
    h = 1.0 / n
    N = st.N

    def uid(j, i):
        return off_u + j * (n + 1) + i

    def vid(j, i):
        return off_v + j * n + i

    def pid(j, i):
        return off_p + j * n + i

    rows, cols, vals = [], [], []
    b = np.zeros(N)

    def add(r, c, v):
        rows.append(r); cols.append(c); vals.append(v)

    # u-momentum at interior vertical faces (i=1..n-1), all rows j
    for j in range(n):
        for i in range(n + 1):
            r = uid(j, i)
            x, y = i * h, (j + 0.5) * h
            if i == 0 or i == n:
                add(r, r, 1.0)           # wall: u = 0
                continue
            add(r, r, 4.0 / h ** 2)
            add(r, uid(j, i - 1), -1.0 / h ** 2)
            add(r, uid(j, i + 1), -1.0 / h ** 2)
            # tangential neighbors; wall rows use reflected ghost (u_g=-u)
            for jj, wall in ((j - 1, j == 0), (j + 1, j == n - 1)):
                if wall:
                    add(r, r, 1.0 / h ** 2)   # ghost reflection adds +1
                else:
                    add(r, uid(jj, i), -1.0 / h ** 2)
            # pressure gradient dp/dx
            add(r, pid(j, i), 1.0 / h)
            add(r, pid(j, i - 1), -1.0 / h)
            b[r] = -_lap4(exact_u, x, y)
    # v-momentum at interior horizontal faces
    for j in range(n + 1):
        for i in range(n):
            r = vid(j, i)
            x, y = (i + 0.5) * h, j * h
            if j == 0 or j == n:
                add(r, r, 1.0)
                continue
            add(r, r, 4.0 / h ** 2)
            add(r, vid(j - 1, i), -1.0 / h ** 2)
            add(r, vid(j + 1, i), -1.0 / h ** 2)
            for ii, wall in ((i - 1, i == 0), (i + 1, i == n - 1)):
                if wall:
                    add(r, r, 1.0 / h ** 2)
                else:
                    add(r, vid(j, ii), -1.0 / h ** 2)
            add(r, pid(j, i), 1.0 / h)
            add(r, pid(j - 1, i), -1.0 / h)
            b[r] = -_lap4(exact_v, x, y)
    # continuity at elements: div u = 0 (+ pressure pin at one element)
    for j in range(n):
        for i in range(n):
            r = pid(j, i)
            add(r, uid(j, i + 1), 1.0 / h)
            add(r, uid(j, i), -1.0 / h)
            add(r, vid(j + 1, i), 1.0 / h)
            add(r, vid(j, i), -1.0 / h)
    # pin p(0,0) to fix the pressure nullspace
    r0 = pid(0, 0)
    add(r0, r0, 1.0)

    import scipy.sparse as sp
    A = sp.csr_matrix((vals, (rows, cols)), shape=(N, N))
    A.sum_duplicates()
    return st, A, b, (off_u, off_v, off_p)


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    n = pt.options().get_int("n", default=16)
    st, A_sp, b_np, (off_u, off_v, off_p) = assemble(n)
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("fgmres")
    pc = ksp.getPC()
    pc.setType("fieldsplit")
    pc._impl.ftype = "schur"
    pc._impl.schur_fact = "full"
    pc._impl.schur_pre = "selfp"
    pc._impl.setIS("v", np.arange(off_p))            # velocities
    pc._impl.setIS("p", np.arange(off_p, A_sp.shape[0]))
    pt.options().set_value("fieldsplit_v_pc_type", "ilu")
    pt.options().set_value("fieldsplit_p_pc_type", "jacobi")
    ksp.setTolerances(rtol=1e-10, max_it=400)
    b = pt.Vec.from_array(b_np)
    x = A.createVecRight()
    ksp.solve(b, x)
    sol = np.asarray(x.getArray())

    # errors vs manufactured solution
    h = 1.0 / n
    uerr = perr = 0.0
    cnt = 0
    for j in range(n):
        for i in range(1, n):
            x_, y_ = i * h, (j + 0.5) * h
            uerr = max(uerr, abs(sol[off_u + j * (n + 1) + i]
                                 - exact_u(x_, y_)))
            cnt += 1
    # discrete divergence
    div = 0.0
    for j in range(n):
        for i in range(n):
            d = (sol[off_u + j * (n + 1) + i + 1]
                 - sol[off_u + j * (n + 1) + i]
                 + sol[off_v + (j + 1) * n + i]
                 - sol[off_v + j * n + i]) / h
            div = max(div, abs(d))
    print(f"its {ksp.getIterationNumber()} u_err {uerr:.3e} "
          f"max|div u| {div:.3e}")
    return ksp, uerr, div


if __name__ == "__main__":
    main()
