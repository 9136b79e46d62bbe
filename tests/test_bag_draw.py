"""PetscBag and PetscDraw analogs."""

import io
import numpy as np

import petsc_tpu as pt
from petsc_tpu.sys.bag import Bag
from petsc_tpu.sys.draw import DrawLG, tensor_contour, ppm_save


def test_bag_register_options_view(tmp_path):
    pt.init(args=["-params_rho", "2.5", "-params_scheme", "upwind"])
    bag = Bag("params", "problem parameters")
    bag.setOptionsPrefix("params_")
    bag.registerReal("rho", 1.0, "density")
    bag.registerInt("steps", 10, "time steps")
    bag.registerBool("verbose", False, "chatter")
    bag.registerEnum("scheme", ("centered", "upwind"), 0, "advection")
    bag.setFromOptions()
    assert bag.rho == 2.5 and bag.steps == 10 and bag.scheme == "upwind"
    bag.steps = 20
    assert bag.get("steps") == 20
    buf = io.StringIO()
    bag.view(file=buf)
    assert "rho = 2.5; density" in buf.getvalue()
    p = str(tmp_path / "bag.npz")
    bag.save(p)
    bag2 = Bag("params")
    bag2.registerReal("rho", 0.0)
    bag2.registerInt("steps", 0)
    bag2.load(p)
    assert bag2.rho == 2.5 and bag2.steps == 20
    pt.init(args=[])


def test_drawlg_renders_residual_curve():
    lg = DrawLG()
    for i in range(30):
        lg.addPoint(i, 10.0 ** (-0.3 * i))
    buf = io.StringIO()
    lg.draw(file=buf)
    out = buf.getvalue()
    assert "log10" in out and "*" in out


def test_tensor_contour_and_ppm(tmp_path):
    x = np.linspace(0, 1, 24)
    f = np.sin(3 * x)[None, :] * np.cos(2 * x)[:, None]
    buf = io.StringIO()
    tensor_contour(f, file=buf)
    assert "@" in buf.getvalue()
    p = str(tmp_path / "f.ppm")
    ppm_save(p, f)
    head = open(p, "rb").read(20)
    assert head.startswith(b"P5\n24 24\n255\n")


def test_mat_products():
    import scipy.sparse as sp
    rng = np.random.default_rng(0)
    A0 = sp.random(10, 10, density=0.4, random_state=0, format="csr")
    P0 = sp.random(10, 4, density=0.5, random_state=1, format="csr")
    A = pt.MatAIJ.from_scipy(A0)
    P = pt.MatAIJ.from_scipy(P0)
    assert np.allclose(A.matMult(P).to_scipy().toarray(),
                       (A0 @ P0).toarray())
    assert np.allclose(A.ptap(P).to_scipy().toarray(),
                       (P0.T @ A0 @ P0).toarray())
    assert np.allclose(A.transposeMatMult(A).to_scipy().toarray(),
                       (A0.T @ A0).toarray())
    R = pt.MatAIJ.from_scipy(sp.csr_matrix(P0.T))
    assert np.allclose(A.rart(R).to_scipy().toarray(),
                       (P0.T @ A0 @ P0).toarray())
