"""Every runnable example executes end-to-end with small arguments —
the examples/ directory is part of the tested surface (the reference
runs its tutorials in CI the same way)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CASES = [
    ("ex1", []),
    ("ex2", ["-m", "5", "-n", "5"]),
    ("ex5", ["-da_grid_x", "9", "-da_grid_y", "9"]),
    ("ex45", ["-da_grid_x", "9", "-da_grid_y", "9", "-da_grid_z", "9"]),
    ("heat", []),
    ("dd_matis", ["-ne", "8", "-nsub", "2"]),
    ("dd_matis", ["-ne", "8", "-nsub", "2", "-solver", "fetidp"]),
]


@pytest.mark.parametrize("name,args", CASES,
                         ids=[f"{n}{('-' + a[-1]) if n == 'dd_matis' else ''}"
                              for n, a in CASES])
def test_example_runs(name, args):
    import importlib
    mod = importlib.import_module(f"examples.{name}")
    mod.main(args)


def test_example_stokes():
    import examples.stokes_stag as st
    st.main(["-nx", "8"]) if "nx" in open(
        st.__file__).read() else st.main([])


def test_ex7_bjacobi_blocks():
    import examples.ex7 as ex7
    ksp = ex7.main(["-pc_bjacobi_blocks", "2"])
    assert ksp.getConvergedReason().converged
    assert ksp.getIterationNumber() <= 8


def test_poisson512_example_small():
    """examples/poisson512.py at a CPU-scale n (its-differenced CG on the
    device-generated constant stencil; gamg mode exercises the Amat/Pmat
    host_only split)."""
    import examples.poisson512 as p512
    t, nnz = p512.main(["-n", "24", "-its", "5"])
    assert nnz == 24 ** 3 * 7 - 6 * 24 * 24
    t2, _ = p512.main(["-n", "16", "-its", "4", "-pc_type", "gamg"])
