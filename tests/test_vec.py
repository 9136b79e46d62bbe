"""Vec tests (reference model: src/vec/vec/tests)."""
import numpy as np
import pytest

import petsc_tpu as pt


@pytest.fixture(scope="module", autouse=True)
def _init():
    pt.init()


def test_create_and_set():
    v = pt.Vec().setSizes(10).setUp()
    v.set(3.0)
    assert v.getSize() == 10
    np.testing.assert_allclose(v.getArray(), 3.0)
    assert v.sum() == pytest.approx(30.0)


def test_blas1():
    x = pt.Vec.from_array(np.arange(5.0))
    y = pt.Vec.from_array(np.ones(5))
    y.axpy(2.0, x)              # y = 2x + 1
    np.testing.assert_allclose(y.getArray(), 2 * np.arange(5.0) + 1)
    assert x.dot(x) == pytest.approx(np.sum(np.arange(5.0) ** 2))
    assert x.norm() == pytest.approx(np.linalg.norm(np.arange(5.0)))
    assert x.norm(pt.NormType.NORM_1) == pytest.approx(10.0)
    assert x.norm(pt.NormType.NORM_INFINITY) == pytest.approx(4.0)


def test_pointwise():
    x = pt.Vec.from_array(np.array([1.0, 2.0, 4.0]))
    y = pt.Vec.from_array(np.array([2.0, 2.0, 2.0]))
    w = x.duplicate()
    w.pointwiseMult(x, y)
    np.testing.assert_allclose(w.getArray(), [2, 4, 8])
    w.pointwiseDivide(x, y)
    np.testing.assert_allclose(w.getArray(), [0.5, 1, 2])
    x.reciprocal()
    np.testing.assert_allclose(x.getArray(), [1, 0.5, 0.25])


def test_reciprocal_keeps_zero():
    x = pt.Vec.from_array(np.array([2.0, 0.0, 4.0]))
    x.reciprocal()
    np.testing.assert_allclose(x.getArray(), [0.5, 0.0, 0.25])


def test_setvalues_add():
    v = pt.Vec().setSizes(6).setUp()
    v.setValues([1, 3], [10.0, 30.0])
    v.setValues([1], [5.0], pt.InsertMode.ADD_VALUES)
    arr = v.getArray()
    assert arr[1] == 15.0 and arr[3] == 30.0


def test_max_min():
    v = pt.Vec.from_array(np.array([3.0, -7.0, 5.0]))
    i, m = v.max()
    assert (i, m) == (2, 5.0)
    i, m = v.min()
    assert (i, m) == (1, -7.0)


def test_sharded_vec_padding():
    """Zero-tail invariant on an 8-shard uneven layout."""
    comm = pt.comm_world(8)
    v = pt.Vec(comm).setSizes(13).setUp()  # block=2, Npad=16, pad=3
    assert v.layout.pad == 3
    v.set(1.0)
    assert v.sum() == pytest.approx(13.0)
    assert v.norm() == pytest.approx(np.sqrt(13.0))
    i, m = v.max()
    assert m == 1.0
    v.shift(-2.0)  # all -1; padding must stay 0
    assert v.norm(pt.NormType.NORM_INFINITY) == pytest.approx(1.0)
    assert v.sum() == pytest.approx(-13.0)


def test_fused_reductions():
    x = pt.Vec.from_array(np.arange(4.0))
    y = pt.Vec.from_array(np.ones(4))
    d, n2, n1 = pt.fused_reductions([("dot", x, y), ("norm2", x), ("norm1", y)])
    assert d == pytest.approx(6.0)
    assert n2 == pytest.approx(np.linalg.norm(np.arange(4.0)))
    assert n1 == pytest.approx(4.0)


def test_vec_extended_ops():
    a = pt.Vec.from_array(np.array([1.0, 2.0, 3.0, 4.0]))
    b = pt.Vec.from_array(np.array([4.0, 3.0, 2.0, 1.0]))
    z = pt.Vec.from_array(np.ones(4))
    z.axpbypcz(2.0, 3.0, 0.5, a, b)
    assert np.allclose(np.asarray(z.getArray())[:4],
                       2 * np.array([1, 2, 3, 4]) + 3 * np.array([4, 3, 2, 1]) + 0.5)
    a2 = a.duplicate(); a2.setArray(a.getArray())
    b2 = b.duplicate(); b2.setArray(b.getArray())
    a2.swap(b2)
    assert np.allclose(np.asarray(a2.getArray())[:4], [4, 3, 2, 1])
    d, n2 = a.dotNorm2(b)
    assert np.isclose(d, 20.0) and np.isclose(n2, 30.0)
    sub = a.getSubVector([1, 3])
    assert np.allclose(np.asarray(sub.getArray())[:2], [2, 4])
    sub.scale(10.0)
    a.restoreSubVector([1, 3], sub)
    assert np.allclose(np.asarray(a.getArray())[:4], [1, 20, 3, 40])


def test_vec_stride_ops():
    v = pt.Vec.from_array(np.array([1.0, 10.0, 2.0, 20.0, 3.0, 30.0]))
    g = v.strideGather(1, bs=2)
    assert np.allclose(np.asarray(g.getArray())[:3], [10, 20, 30])
    g.scale(0.1)
    v.strideScatter(1, g, bs=2)
    assert np.allclose(np.asarray(v.getArray())[:6], [1, 1, 2, 2, 3, 3])
    assert np.isclose(v.strideNorm(0, bs=2), np.sqrt(14.0))
