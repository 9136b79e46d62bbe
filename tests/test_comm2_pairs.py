"""Two-level (dcn x ici) comm: neighbor-pair classification for slab
halo permutes (SURVEY §2.12, sfneighbor.c role) and the fieldsplit
public configuration surface (r4 VERDICT weak 7).
"""
import numpy as np
import scipy.sparse as sp

import petsc_tpu as pt
from petsc_tpu.parallel.mesh import make_comm, make_comm2


def test_halo_pair_classes_two_level():
    comm = make_comm2(2, 4)
    cls = comm.halo_pair_classes((1, -1, 2))
    for d in (1, -1):
        assert cls[d] == {"ici": 6, "dcn": 2}, cls
    # offset 2 jumps shards {2->0,3->1,...}: crossings double
    assert cls[2]["dcn"] == 4, cls


def test_halo_pair_classes_single_level():
    comm = make_comm(8)
    cls = comm.halo_pair_classes((1,))
    assert cls[1] == {"ici": 8, "dcn": 0}


def test_fieldsplit_public_api_schur():
    n = 40
    A_sp = (sp.diags([4.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                     [0, 1, -1]) + sp.eye(n) * 0.3).tocsr()
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create().setType("fgmres")
    ksp.setOperators(A)
    pc = ksp.getPC()
    pt.options().set_value("pc_type", "fieldsplit")
    pt.options().set_value("pc_fieldsplit_type", "schur")
    pt.options().set_value("pc_fieldsplit_schur_precondition", "selfp")
    pc.setFromOptions()
    pc.setFieldSplitIS(("0", np.arange(0, n, 2)),
                       ("1", np.arange(1, n, 2)))
    for k in ("pc_type", "pc_fieldsplit_type",
              "pc_fieldsplit_schur_precondition"):
        pt.options().set_value(k, "")
    assert pc._impl.ftype == "schur"
    assert pc._impl.schur_pre == "selfp"
    ksp.setTolerances(rtol=1e-10, max_it=100)
    u = A.createVecRight(); u.set(1.0)
    b = A.createVecLeft(); A.mult(u, b)
    x = A.createVecRight()
    ksp.solve(b, x)
    assert ksp.getConvergedReason().converged
    x.axpy(-1.0, u)
    assert float(x.norm()) < 1e-7
