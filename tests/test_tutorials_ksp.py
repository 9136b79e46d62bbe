"""Tutorial-parity tests: our examples diffed against the reference's
pinned expected outputs (values transcribed from
/root/reference/src/ksp/ksp/tutorials/output/*.out — iteration counts and
residual norms are the correctness contract, SURVEY.md §4)."""
import sys
from pathlib import Path

import pytest

import petsc_tpu as pt
from petsc_tpu.utils.testing import assert_output, run_example

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import ex2  # noqa: E402


# reference: output/ex2_1.out (args from ex2.c TEST block, no suffix)
EX2_1 = """\
  0 KSP Residual norm 3.21109
  1 KSP Residual norm 0.93268
  2 KSP Residual norm 0.103515
  3 KSP Residual norm 0.00787798
  4 KSP Residual norm 0.000387275
Norm of error 0.000392701 iterations 4
"""


def test_ex2_gmres_ilu_reference_parity():
    out = run_example(ex2.main,
                      "-m 5 -n 5 -ksp_monitor_short "
                      "-ksp_gmres_cgs_refinement_type refine_always")
    # exact-text parity achieved; keep tiny numeric slack for cross-platform
    assert_output(out, EX2_1, rtol=1e-3)


def test_ex2_default_size_gmres_ilu():
    """Default 8x7 grid, default solver: converges quickly with small error."""
    out = run_example(ex2.main, "")
    norm, its = [l for l in out.splitlines() if l.startswith("Norm")][0].split()[3], None
    assert float(norm) < 1e-3


def test_ex2_bcgs():
    out = run_example(ex2.main, "-ksp_type bcgs -m 5 -n 5")
    line = [l for l in out.splitlines() if l.startswith("Norm")][0]
    assert float(line.split()[3]) < 5e-3


def test_ex2_cg_jacobi():
    out = run_example(ex2.main, "-ksp_type cg -pc_type jacobi -m 9 -n 9 "
                                "-ksp_rtol 1e-10")
    line = [l for l in out.splitlines() if l.startswith("Norm")][0]
    assert float(line.split()[3]) < 1e-7


def test_ex2_lu_preonly():
    out = run_example(ex2.main, "-ksp_type preonly -pc_type lu -m 6 -n 5")
    line = [l for l in out.splitlines() if l.startswith("Norm")][0]
    assert float(line.split()[3]) < 1e-10
    assert line.split()[-1] == "1"


def test_ex2_cholesky():
    out = run_example(ex2.main, "-ksp_type preonly -pc_type cholesky -m 4 -n 4")
    line = [l for l in out.splitlines() if l.startswith("Norm")][0]
    assert float(line.split()[3]) < 1e-10


def test_ex2_bjacobi_ilu():
    out = run_example(ex2.main, "-pc_type bjacobi -pc_bjacobi_blocks 4 "
                                "-m 8 -n 8 -ksp_rtol 1e-8")
    line = [l for l in out.splitlines() if l.startswith("Norm")][0]
    assert float(line.split()[3]) < 1e-5


def test_ex2_bjacobi_sub_lu():
    out = run_example(ex2.main, "-pc_type bjacobi -pc_bjacobi_blocks 2 "
                                "-sub_pc_type lu -m 8 -n 8 -ksp_rtol 1e-8")
    line = [l for l in out.splitlines() if l.startswith("Norm")][0]
    assert float(line.split()[3]) < 1e-5


def test_ex2_gmres_restart():
    """Force restarts (restart=5) on a bigger grid; still converges."""
    out = run_example(ex2.main, "-m 12 -n 12 -ksp_gmres_restart 5 "
                                "-pc_type jacobi -ksp_rtol 1e-8 ")
    line = [l for l in out.splitlines() if l.startswith("Norm")][0]
    assert float(line.split()[3]) < 1e-4


# reference: output/ex2_3.out (-pc_type sor -pc_sor_symmetric, default 8x7)
EX2_3 = """\
  0 KSP Residual norm 2.98499
  1 KSP Residual norm 1.13133
  2 KSP Residual norm 0.575925
  3 KSP Residual norm 0.108871
  4 KSP Residual norm 0.0213225
  5 KSP Residual norm 0.00325239
  6 KSP Residual norm 0.000874208
  7 KSP Residual norm 0.000179613
Norm of error 0.000300302 iterations 7
"""

# reference: output/ex2_2.out (nsize=2: parallel default bjacobi+ilu blocks)
EX2_2 = """\
  0 KSP Residual norm 2.73499
  1 KSP Residual norm 0.795482
  2 KSP Residual norm 0.261984
  3 KSP Residual norm 0.0752998
  4 KSP Residual norm 0.0230031
  5 KSP Residual norm 0.00521255
  6 KSP Residual norm 0.00145783
  7 KSP Residual norm 0.000277319
Norm of error 0.000292349 iterations 7
"""


def test_ex2_3_sor_reference_parity():
    """GMRES + symmetric SOR: char-exact vs reference ex2_3.out."""
    out = run_example(ex2.main, "-pc_type sor -pc_sor_symmetric "
                      "-ksp_monitor_short "
                      "-ksp_gmres_cgs_refinement_type refine_always")
    assert_output(out, EX2_3, rtol=1e-6)


def test_ex2_2_nsize2_reference_parity():
    """nsize=2 run (sharded MPIAIJ + default bjacobi/ILU): char-exact vs
    reference ex2_2.out — the 'same binary at any size' contract."""
    from petsc_tpu.parallel.mesh import make_comm
    out = run_example(ex2.main, "-ksp_monitor_short -m 5 -n 5 "
                      "-ksp_gmres_cgs_refinement_type refine_always",
                      comm=make_comm(2))
    assert_output(out, EX2_2, rtol=1e-6)


# reference: output/ex2_bjacobi.out (nsize=4, one bjacobi block, inner
# gmres+jacobi sub-solves)
EX2_BJACOBI = """\
  0 KSP Residual norm 7.48331
  1 KSP Residual norm 2.10143e-06
Norm of error 2.10144e-06 iterations 1
"""


def test_ex2_bjacobi_subksp_reference_parity():
    """bjacobi with ITERATIVE inner solves (sub_ksp_type gmres): char-exact
    vs reference ex2_bjacobi.out at nsize=4."""
    from petsc_tpu.parallel.mesh import make_comm
    out = run_example(ex2.main, "-pc_type bjacobi -pc_bjacobi_blocks 1 "
                      "-ksp_monitor_short -sub_pc_type jacobi "
                      "-sub_ksp_type gmres", comm=make_comm(4))
    assert_output(out, EX2_BJACOBI, rtol=1e-6)


def test_ex2_chebyest_class_parity():
    """ex2 chebyest_1 configuration (right-PC inner-Chebyshev as PC with
    esteig transform): same convergence class as reference (15 its)."""
    out = run_example(ex2.main, "-m 80 -n 80 -ksp_pc_side right "
                      "-pc_type ksp -ksp_ksp_type chebyshev "
                      "-ksp_ksp_max_it 5 "
                      "-ksp_ksp_chebyshev_esteig 0.9,0,0,1.1")
    line = [l for l in out.splitlines() if l.startswith("Norm")][0]
    its = int(line.split()[-1])
    assert its <= 18  # reference: 15 (esteig Ritz methodology differs)


# reference: output/ex1_1.out (tridiagonal; both solves — the second after
# MatShift exercises operator-state propagation into the compiled solver)
EX1_1 = """\
  0 KSP Residual norm 0.707107
  1 KSP Residual norm 0.316228
  2 KSP Residual norm 0.188982
  3 KSP Residual norm 0.129099
  4 KSP Residual norm 0.0953463
  5 KSP Residual norm < 1.e-11
Norm of error 2.99143e-15, Iterations 5
  0 KSP Residual norm 0.353553
  1 KSP Residual norm 0.0857493
  2 KSP Residual norm 0.0227273
  3 KSP Residual norm 0.0060831
  4 KSP Residual norm 0.0016298
  5 KSP Residual norm < 1.e-11
"""


def test_ex1_tridiagonal_reference_parity():
    import ex1
    out = run_example(ex1.main,
                      "-ksp_monitor_short "
                      "-ksp_gmres_cgs_refinement_type refine_always")
    # error norm is O(eps); compare with absolute slack there
    assert_output(out, EX1_1, rtol=1e-3, atol=1e-13)


# reference: output/ex2_bjacobi_3.out (nsize=4: -pc_bjacobi_blocks 4 with
# inner gmres+jacobi sub-solves, default 8x7 grid)
EX2_BJ3 = """\
  0 KSP Residual norm 3.44632
  1 KSP Residual norm 1.321
  2 KSP Residual norm 0.720888
  3 KSP Residual norm 0.383469
  4 KSP Residual norm 0.0585789
  5 KSP Residual norm 0.0187709
  6 KSP Residual norm 0.00119179
  7 KSP Residual norm 0.000321916
Norm of error 0.000404746 iterations 7
"""


def test_ex2_bjacobi_3_reference_parity():
    """4-block bjacobi with iterative (gmres+jacobi) sub-solves: the
    reference's ex2_bjacobi_3.out monitor values."""
    out = run_example(ex2.main,
                      "-pc_type bjacobi -pc_bjacobi_blocks 4 "
                      "-sub_pc_type jacobi -sub_ksp_type gmres "
                      "-ksp_monitor_short "
                      "-ksp_gmres_cgs_refinement_type refine_always")
    assert_output(out, EX2_BJ3, rtol=1e-3)


# reference: output/ex2_bjacobi_2.out monitor section (nsize=4,
# -pc_bjacobi_blocks 2; the ksp_view dump is checked separately)
EX2_BJ2 = """\
  0 KSP Residual norm 5.18566
  1 KSP Residual norm 0.882327
  2 KSP Residual norm 0.232433
  3 KSP Residual norm 0.0193881
  4 KSP Residual norm 0.000403063
Norm of error 0.000496964 iterations 4
"""


def test_ex2_bjacobi_2_reference_parity():
    out = run_example(ex2.main,
                      "-pc_type bjacobi -pc_bjacobi_blocks 2 "
                      "-sub_pc_type jacobi -sub_ksp_type gmres "
                      "-ksp_rtol 0.000138889 -ksp_monitor_short "
                      "-ksp_gmres_cgs_refinement_type refine_always")
    assert_output(out, EX2_BJ2, rtol=1e-3)


def test_ex2_chebyest_inner_chebyshev_pc():
    """ex2 chebyest_1: GMRES right-preconditioned by 5 inner Chebyshev
    iterations with the esteig transform (0.9,0; 0,1.1). The reference
    converges in 15 iterations; the estimator's Ritz bounds differ in the
    last digits so we assert the same behavioral envelope."""
    out = run_example(ex2.main,
                      "-m 80 -n 80 -ksp_pc_side right -pc_type ksp "
                      "-ksp_ksp_type chebyshev -ksp_ksp_max_it 5 "
                      "-ksp_ksp_chebyshev_esteig 0.9,0,0,1.1 ")
    line = [l for l in out.splitlines() if l.startswith("Norm")][0]
    err, its = float(line.split()[3]), int(line.split()[-1])
    assert 12 <= its <= 19, its          # reference: 15
    assert err < 1e-3


# reference: output/ex2_4.out (-pc_type eisenstat, default 8x7 grid) —
# TRUE Eisenstat trick: transformed-system iteration w/ diagonal PCApply
EX2_4 = """\
  0 KSP Residual norm 8.27636
  1 KSP Residual norm 2.71231
  2 KSP Residual norm 1.42381
  3 KSP Residual norm 0.36228
  4 KSP Residual norm 0.0646682
  5 KSP Residual norm 0.00995895
  6 KSP Residual norm 0.00236302
  7 KSP Residual norm 0.000575025
Norm of error 0.000372942 iterations 7
"""


def test_ex2_eisenstat_reference_parity():
    out = run_example(ex2.main,
                      "-pc_type eisenstat -ksp_monitor_short "
                      "-ksp_gmres_cgs_refinement_type refine_always")
    assert_output(out, EX2_4, rtol=1e-3)
