"""Domain decomposition on an unassembled MATIS operator: BDDC and
FETI-DP on a Q1 Poisson problem torn into subdomains.

Reference workflow: src/ksp/ksp/tutorials/ex59.c / ex71.c (MATIS +
PCBDDC/KSPFETIDP). Builds per-subdomain Neumann stiffness matrices on an
ne x ne Q1 grid split nsub x nsub, then solves with
  -solver bddc    CG preconditioned by the two-level additive BDDC
  -solver fetidp  the dual-primal interconnect solve
Both converge in O(polylog(H/h)) iterations independent of the number of
subdomains.

Run: python examples/dd_matis.py -ne 16 -nsub 4 -solver bddc
"""

import sys as _sys
from pathlib import Path

_sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import petsc_tpu as pt

KE = np.array([
    [4.0, -1.0, -1.0, -2.0],
    [-1.0, 4.0, -2.0, -1.0],
    [-1.0, -2.0, 4.0, -1.0],
    [-2.0, -1.0, -1.0, 4.0],
]) / 6.0


def build(ne, nsub):
    nn = ne + 1

    def nid(i, j):
        return j * nn + i

    interior = {}
    for j in range(1, ne):
        for i in range(1, ne):
            interior[nid(i, j)] = len(interior)
    eps = ne // nsub
    mats, maps = [], []
    for sy in range(nsub):
        for sx in range(nsub):
            order, loc = [], {}
            for ej in range(sy * eps, (sy + 1) * eps):
                for ei in range(sx * eps, (sx + 1) * eps):
                    for nd in (nid(ei, ej), nid(ei + 1, ej),
                               nid(ei, ej + 1), nid(ei + 1, ej + 1)):
                        if nd in interior and nd not in loc:
                            loc[nd] = len(order)
                            order.append(nd)
            K = np.zeros((len(order), len(order)))
            for ej in range(sy * eps, (sy + 1) * eps):
                for ei in range(sx * eps, (sx + 1) * eps):
                    nodes = [nid(ei, ej), nid(ei + 1, ej),
                             nid(ei, ej + 1), nid(ei + 1, ej + 1)]
                    for a in range(4):
                        for b_ in range(4):
                            if nodes[a] in loc and nodes[b_] in loc:
                                K[loc[nodes[a]], loc[nodes[b_]]] += KE[a, b_]
            mats.append(K)
            maps.append(np.asarray([interior[n] for n in order]))
    return pt.MatIS.create(len(interior), mats, maps), len(interior)


def main(argv=None):
    pt.init(args=argv if argv is not None else _sys.argv[1:])
    opts = pt.options()
    ne = opts.get_int("ne", default=16)
    nsub = opts.get_int("nsub", default=4)
    solver = opts.get_string("solver", default="bddc")
    M, n = build(ne, nsub)
    ksp = pt.KSP().create()
    ksp.setOperators(M)
    if solver == "fetidp":
        ksp.setType("fetidp")
    else:
        ksp.setType("cg")
        ksp.getPC().setType("bddc")
    ksp.setTolerances(rtol=1e-8)
    b = pt.Vec.from_array(np.ones(n))
    x = pt.Vec.from_array(np.zeros(n))
    ksp.solve(b, x)
    S = M.assemble_global().to_scipy()
    r = S @ np.asarray(x.getArray())[:n] - 1.0
    print(f"{solver}: n={n} subdomains={nsub * nsub} "
          f"iterations={ksp.getIterationNumber()} "
          f"true_residual={np.linalg.norm(r):.3e}")
    return ksp


if __name__ == "__main__":
    main()
