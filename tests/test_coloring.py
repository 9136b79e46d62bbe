"""MatColoring types (src/mat/graphops/color: jp.c, greedy.c, power.c,
color.c orderings) + MatFDColoring integration."""

import numpy as np
import pytest

import petsc_tpu as pt
from petsc_tpu.mat.coloring import MatColoring, jp_color, _column_graph
from tests.test_mg_gamg import poisson2d


@pytest.mark.parametrize("ctype", ["jp", "greedy", "sl", "lf", "id"])
def test_coloring_valid_distance2(ctype):
    A = pt.MatAIJ.from_scipy(poisson2d(12))
    mc = MatColoring.create(A).setType(ctype)
    colors = mc.apply()
    assert mc.validate(colors)
    # 5-point stencil distance-2 graph needs few colors; JP may use a
    # couple more than greedy but must stay small
    assert colors.max() + 1 <= 12


def test_coloring_natural():
    A = pt.MatAIJ.from_scipy(poisson2d(6))
    colors = MatColoring.create(A).setType("natural").apply()
    assert len(np.unique(colors)) == 36


def test_coloring_power_contains_distance2():
    """Power-2 coloring must also be a valid distance-2 coloring (the
    power graph contains the distance-2 graph)."""
    A = pt.MatAIJ.from_scipy(poisson2d(10))
    mc = MatColoring.create(A).setType("power")
    colors = mc.apply()
    assert mc.validate(colors)


def test_jp_rounds_match_greedy_quality():
    C = _column_graph(poisson2d(16).tocsr())
    colors = jp_color(C, seed=3)
    rows = np.repeat(np.arange(C.shape[0]), np.diff(C.indptr))
    assert np.all(colors[rows] != colors[C.indices])


def test_fdcoloring_with_jp_reconstructs_jacobian():
    A_sp = poisson2d(8)
    A = pt.MatAIJ.from_scipy(A_sp)
    from petsc_tpu.mat.fdcoloring import MatFDColoring
    fdc = MatFDColoring(A, ctype="jp")

    def fn(x):
        return A_sp @ x

    J = fdc.apply(fn, np.zeros(64))
    assert np.allclose(J.to_scipy().toarray(), A_sp.toarray(), atol=1e-6)


def test_jp_distance1_no_selfloop():
    """Distance-1 coloring must strip the diagonal (a self-loop would
    defeat JP's local-max test and validate())."""
    A = pt.MatAIJ.from_scipy(poisson2d(10))
    mc = MatColoring.create(A).setType("jp").setDistance(1)
    colors = mc.apply()
    assert mc.validate(colors)
    assert colors.max() + 1 <= 6
