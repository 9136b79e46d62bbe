"""AMR loop acceptance: estimate -> Doerfler-mark -> DMAdaptLabel ->
solve on the L-shaped corner singularity beats uniform refinement per
dof and recovers a near-optimal rate (examples/adaptive_poisson.py;
reference counterpart: snes ex12 + plexadapt.c)."""

import numpy as np

from examples.adaptive_poisson import (doerfler_mark, estimate,
                                       lshape_mesh, solve_p1)


def test_amr_beats_uniform_per_dof():
    plex = lshape_mesh(4)
    hist = []
    for it in range(7):
        u, ndof, err, gu, vol = solve_p1(plex)
        hist.append((ndof, err))
        if it < 6:
            plex = plex.adaptLabel(doerfler_mark(estimate(plex, gu),
                                                 0.5))
    # error strictly decreases through the loop
    errs = [e for _, e in hist]
    assert all(e2 < e1 for e1, e2 in zip(errs, errs[1:]))
    # near-optimal rate in h-equivalent (err ~ N^{-r/2}); the
    # singularity-limited uniform rate is 4/3
    (n1, e1), (n2, e2) = hist[0], hist[-1]
    rate = np.log(e1 / e2) / np.log(np.sqrt(n2 / n1))
    assert rate > 1.7, (hist, rate)
    # and beats the next-larger uniform refinement with FEWER dofs and
    # LOWER error (the error-per-dof win)
    uni = lshape_mesh(4).refine().refine().refine()
    _, ndof_u, err_u, _, _ = solve_p1(uni)
    n_a, e_a = hist[-1]
    assert n_a < ndof_u and e_a < err_u, (hist[-1], (ndof_u, err_u))


def test_estimator_targets_the_corner():
    plex = lshape_mesh(4)
    u, ndof, err, gu, vol = solve_p1(plex)
    eta = estimate(plex, gu)
    cc = plex.coords[plex.cells].mean(axis=1)
    worst = cc[np.argmax(eta)]
    assert np.linalg.norm(worst) < 0.3, worst
