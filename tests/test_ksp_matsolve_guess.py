"""KSPMatSolve (batched multi-RHS) + KSPGuess Fischer tests."""

import numpy as np

import petsc_tpu as pt
from tests.test_mg_gamg import poisson2d


def test_matsolve():
    A_sp = poisson2d(12)
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-10, max_it=500)
    rng = np.random.default_rng(0)
    Xstar = rng.random((144, 5))
    B = A_sp @ Xstar
    X = ksp.matSolve(B)
    assert ksp.getConvergedReason().converged
    assert np.allclose(X.getDenseArray(), Xstar, atol=1e-6)


def test_guess_fischer_reduces_iterations():
    A_sp = poisson2d(16)
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    # absolute tolerance so the projected guess's head start counts
    # (rtol is relative to ||r0||, which the guess shrinks)
    ksp.setTolerances(rtol=1e-30, atol=1e-8, max_it=500)
    ksp.setGuessType("fischer", size=8)
    # slowly varying RHS sequence (timestepping pattern)
    t = np.linspace(0, 1, 256)
    its = []
    for k in range(6):
        b = pt.Vec.from_array(np.sin(2 * np.pi * (t + 0.01 * k)))
        x = A.createVecRight()
        ksp.solve(b, x)
        assert ksp.getConvergedReason().converged
        its.append(ksp.getIterationNumber())
    assert its[-1] < its[0] * 0.6, its


def test_guess_pod_reduces_iterations():
    """KSPGuess POD (src/ksp/ksp/guess/impls/pod/pod.c): SVD-compressed
    solution history + Galerkin-projected guess."""
    A_sp = poisson2d(16)
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-30, atol=1e-8, max_it=500)
    ksp.setGuessType("pod", size=8)
    t = np.linspace(0, 1, 256)
    its = []
    for k in range(6):
        b = pt.Vec.from_array(np.sin(2 * np.pi * (t + 0.01 * k)))
        x = A.createVecRight()
        ksp.solve(b, x)
        assert ksp.getConvergedReason().converged
        its.append(ksp.getIterationNumber())
    assert its[-1] < its[0] * 0.6, its


def test_guess_pod_exact_on_repeated_rhs():
    """A RHS already solved must get a (near-)exact guess: the reduced
    Galerkin system reproduces the snapshot solution."""
    A_sp = poisson2d(12)
    A = pt.MatAIJ.from_scipy(A_sp)
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-30, atol=1e-9, max_it=500)
    ksp.setGuessType("pod", size=4)
    b = pt.Vec.from_array(np.ones(144))
    x = A.createVecRight()
    ksp.solve(b, x)
    first = ksp.getIterationNumber()
    x2 = A.createVecRight()
    ksp.solve(b, x2)
    assert ksp.getIterationNumber() <= max(first // 10, 1)
