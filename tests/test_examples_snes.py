"""SNES tutorial-example parity tests (reference expected outputs under
src/snes/tutorials/output/)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_ex19_driven_cavity_parity(capsys):
    """ex19 (driven cavity): initial SNES function norm is char-exact vs
    the reference's ex19_1.out (0.0406612 at -da_refine 3) and Newton
    converges in 2 iterations."""
    import examples.ex19 as ex19
    snes, x, (mx, my) = ex19.main(["-da_refine", "3",
                                   "-snes_monitor_short"])
    out = capsys.readouterr().out
    assert "lid velocity = 0.0016, prandtl # = 1., grashof # = 1." in out
    assert "0 SNES Function norm 0.0406612" in out
    assert snes.getIterationNumber() == 2
    assert snes.getConvergedReason().converged
    # physical sanity: the lid BC holds exactly and the field is finite
    X = np.asarray(x.getArray())[: my * mx * 4].reshape(my, mx, 4)
    assert np.allclose(X[-1, 1:-1, 0], 0.0016, atol=1e-10)  # lid (corners owned by side walls)
    assert np.all(np.isfinite(X))


def test_ex12_fem_nonlinear_poisson():
    """SNES ex12 analog: nonlinear FEM Poisson via DMPlex + PetscDS weak
    forms, P2 Lagrange, autodiff-manufactured forcing (src/snes/tutorials/
    ex12.c role)."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import petsc_tpu as pt
    pt.init(args=["-fe_order", "2", "-faces", "8"])
    import examples.ex12 as ex12
    err, snes = ex12.main(["-fe_order", "2", "-faces", "8"])
    assert snes.getIterationNumber() <= 8
    assert err < 5e-4


def test_ex12_p3_more_accurate_than_p1():
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import examples.ex12 as ex12
    e1, _ = ex12.main(["-fe_order", "1", "-faces", "8"])
    e3, _ = ex12.main(["-fe_order", "3", "-faces", "8"])
    assert e3 < e1 / 50
