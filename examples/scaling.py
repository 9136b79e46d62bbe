"""Weak-scaling harness (SURVEY §7 step 8): CG+Jacobi on a 3-D Poisson
slab per device, sweep device counts on one mesh, report parallel
efficiency of iterations/second.

On the CPU test backend this exercises the sharded code path over virtual
devices (communication is real XLA collectives, compute is not
representative); on a real multi-chip slice the same script measures true
weak scaling. Reference model: doc/manual/streams.md scaling studies.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python examples/scaling.py -local_n 16
"""

import sys
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import petsc_tpu as pt


def poisson3d_grid(nz, ny, nx):
    import scipy.sparse as sp
    def lap1(n):
        return sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                        [0, 1, -1])
    Iz, Iy, Ix = (sp.eye(n) for n in (nz, ny, nx))
    return (sp.kron(sp.kron(lap1(nz), Iy), Ix)
            + sp.kron(sp.kron(Iz, lap1(ny)), Ix)
            + sp.kron(sp.kron(Iz, Iy, ), lap1(nx))).tocsr()


def run(ndev, local_n, its=50):
    import jax
    from petsc_tpu.parallel.mesh import make_comm
    nz = local_n * ndev
    A_sp = poisson3d_grid(nz, local_n, local_n)
    comm = make_comm(ndev)
    A = pt.MatAIJ.from_scipy(A_sp, comm=comm)
    A.setStencilGrid((nz, local_n, local_n))
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("jacobi")
    ksp.setTolerances(rtol=1e-30, max_it=its)
    ksp.converged_maxits = True
    b = A.createVecLeft()
    b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)      # compile + warm
    t0 = time.perf_counter()
    ksp.solve(b, x)
    dt = time.perf_counter() - t0
    return dt, A_sp.nnz


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    import jax
    pt.config.ensure_virtual_devices(8)
    opts = pt.options()
    local_n = opts.get_int("local_n", default=16)
    its = opts.get_int("its", default=50)
    ndevs = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    base = None
    print(f"weak scaling: {local_n}^3 rows/device, {its} CG its, "
          f"backend={jax.default_backend()}")
    for nd in ndevs:
        dt, nnz = run(nd, local_n, its)
        rate = nnz * its / dt / 1e9
        if base is None:
            base = rate
        eff = rate / (base * nd) if base else 0.0
        print(f"  ndev={nd}  {dt:.3f} s  {rate:.2f} Gnnz-its/s  "
              f"efficiency={eff * 100:.0f}%")


if __name__ == "__main__":
    main()
