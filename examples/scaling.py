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
    dt = min(_timed_solve(ksp, b, x) for _ in range(3))  # best-of-3 (jitter)
    return dt, A_sp.nnz


def _timed_solve(ksp, b, x):
    t0 = time.perf_counter()
    ksp.solve(b, x)
    return time.perf_counter() - t0


def run_gamg(ndev, local_n, comm=None):
    """CG+GAMG weak-scaling leg: rtol 1e-8, STRUCTURED geometric head at
    every device count — the ndev=1 leg runs the same probed-head +
    aggregation-tail algorithm as the sharded legs (serial aij_dnd vs
    dnd_mpi binders of one code path), so retention vs ndev=1 is
    anchored (r4 VERDICT item 10: the old serial leg took a
    differently-bound path, 19x off). `comm` overrides the mesh (the
    two-level dcn x ici column passes make_comm2)."""
    import jax
    from petsc_tpu.parallel.mesh import make_comm
    nz = local_n * ndev
    A_sp = poisson3d_grid(nz, local_n, local_n)
    A = pt.MatAIJ.from_scipy(A_sp, comm=comm or make_comm(ndev))
    A.setStencilGrid((nz, local_n, local_n))
    ksp = pt.KSP().create()
    ksp.setOperators(A)
    ksp.setType("cg")
    ksp.getPC().setType("gamg")
    ksp.setTolerances(rtol=1e-8, max_it=100)
    b = A.createVecLeft(); b.set(1.0)
    x = A.createVecRight()
    ksp.solve(b, x)      # compile + warm
    x.set(0.0)
    dt = min(_timed_solve(ksp, b, x) for _ in range(3))
    return dt, ksp.getIterationNumber(), A_sp.nnz


def measure_overlap(ndev, local_n, reps=20):
    """Verify the halo/compute overlap claim (MatMult_MPIAIJ pattern,
    mpiaij.c:1052-1065): time the sharded SpMV with the default schedule
    (halo ppermutes and diag SpMV independent — XLA overlaps) vs with
    PETSC_TPU_HALO_SEQUENTIAL=1 (optimization_barrier forces the diag
    SpMV to wait on the halo). Returns (t_overlapped, t_sequential)."""
    import os
    import jax

    def timed(seq):
        os.environ["PETSC_TPU_HALO_SEQUENTIAL"] = "1" if seq else "0"
        from petsc_tpu.parallel.mesh import make_comm
        nz = local_n * ndev
        A_sp = poisson3d_grid(nz, local_n, local_n)
        A = pt.MatAIJ.from_scipy(A_sp, comm=make_comm(ndev))
        # plain ELL mpiaij path (no stencil declaration -> generic binder)
        op = A.op()
        f = jax.jit(op.mult)
        x = A.createVecRight(); x.set(1.0)
        xa = x.getArray()
        y = f(xa); y.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f(xa)
        y.block_until_ready()
        os.environ["PETSC_TPU_HALO_SEQUENTIAL"] = "0"
        return (time.perf_counter() - t0) / reps

    return timed(False), timed(True)


def main(argv=None):
    pt.init(args=argv if argv is not None else sys.argv[1:])
    import jax
    pt.config.ensure_virtual_devices(8)
    opts = pt.options()
    local_n = opts.get_int("local_n", default=16)
    its = opts.get_int("its", default=50)
    json_path = opts.get_string("json", default=None)
    ndevs = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    base = None
    rows = []
    print(f"weak scaling: {local_n}^3 rows/device, {its} CG its, "
          f"backend={jax.default_backend()}")
    for nd in ndevs:
        dt, nnz = run(nd, local_n, its)
        rate = nnz * its / dt / 1e9
        if base is None:
            base = rate
        eff = rate / (base * nd) if base else 0.0
        # on the CPU stand-in one XLA device already multithreads across
        # all physical cores, so per-device efficiency decays as 1/ndev by
        # construction; aggregate-rate retention vs 1 device (fixed host
        # compute, communication added) is the meaningful virtual metric
        rows.append({"ndev": nd, "seconds": round(dt, 4), "nnz": int(nnz),
                     "gnnz_its_per_s": round(rate, 3),
                     "efficiency_per_device": round(eff, 3),
                     "aggregate_retention_vs_1dev": round(rate / base, 3)})
        print(f"  ndev={nd}  {dt:.3f} s  {rate:.2f} Gnnz-its/s  "
              f"per-device eff={eff * 100:.0f}%  "
              f"retention={rate / base * 100:.0f}%")
    # CG+GAMG column: every leg (incl. ndev=1) runs the structured
    # geometric head, so retention is anchored at ndev=1 (same code
    # path throughout — r4 VERDICT item 10).
    gamg_rows = []
    gbase = None
    for nd in ndevs:
        dtg, itsg, nnzg = run_gamg(nd, local_n)
        rateg = nnzg * itsg / dtg / 1e9
        if gbase is None:
            gbase = rateg
        gamg_rows.append({"ndev": nd, "seconds": round(dtg, 4),
                          "its": int(itsg), "nnz": int(nnzg),
                          "gnnz_its_per_s": round(rateg, 3),
                          "aggregate_retention_vs_1dev":
                          round(rateg / gbase, 3)})
        print(f"  gamg ndev={nd}  {dtg:.3f} s  {itsg} its  "
              f"{rateg:.2f} Gnnz-its/s  "
              f"retention={rateg / gbase * 100:.0f}%")
    # two-level (dcn x ici) mesh column (SURVEY §2.12; r4 VERDICT
    # item 5): the same leg on a (hosts x chips) 2-D mesh
    twolevel_rows = []
    if len(jax.devices()) >= 4:
        from petsc_tpu.parallel.mesh import make_comm2
        for hosts, chips in ((2, 2), (2, 4)):
            nd2 = hosts * chips
            if nd2 > len(jax.devices()):
                continue
            c2 = make_comm2(hosts, chips)
            dtg, itsg, nnzg = run_gamg(nd2, local_n, comm=c2)
            rateg = nnzg * itsg / dtg / 1e9
            cls = c2.halo_pair_classes((1,))[1]
            twolevel_rows.append({
                "mesh": f"dcn{hosts}xici{chips}", "ndev": nd2,
                "seconds": round(dtg, 4), "its": int(itsg),
                "gnnz_its_per_s": round(rateg, 3),
                "halo_pairs_d1": cls,
                "aggregate_retention_vs_1dev":
                round(rateg / gbase, 3) if gbase else None})
            print(f"  gamg mesh=({hosts}x{chips})  {dtg:.3f} s  "
                  f"{itsg} its  {rateg:.2f} Gnnz-its/s  "
                  f"halo d=+1 {cls}")
    nd_ov = ndevs[-1]
    t_ov, t_seq = measure_overlap(nd_ov, local_n)
    print(f"overlap check (ndev={nd_ov}): mult {t_ov * 1e3:.3f} ms "
          f"overlapped vs {t_seq * 1e3:.3f} ms halo-sequential "
          f"({(t_seq / t_ov - 1) * 100:+.0f}%)")
    if json_path:
        import json
        import multiprocessing
        out = {
            "harness": "examples/scaling.py",
            "backend": jax.default_backend(),
            "physical_cpus": multiprocessing.cpu_count(),
            "local_n": local_n, "its": its,
            "caveat": ("virtual devices share physical cores and one XLA "
                       "CPU device multithreads across all of them, so "
                       "per-device efficiency decays ~1/ndev by construction;"
                       " the meaningful virtual metric is aggregate-rate "
                       "retention vs 1 device (fixed host compute, halo "
                       "communication added). The overlap check is likewise "
                       "a CPU stand-in: XLA-CPU collectives are synchronous "
                       "host copies, so halo/compute overlap (an ICI "
                       "property) cannot manifest — the sequential variant "
                       "can even win by reducing scheduler pressure. On "
                       "real multi-chip both numbers re-measure unchanged."),
            "weak_scaling": rows,
            "weak_scaling_gamg": gamg_rows,
            "weak_scaling_gamg_two_level": twolevel_rows,
            "overlap_check": {"ndev": nd_ov,
                              "mult_ms_overlapped": round(t_ov * 1e3, 4),
                              "mult_ms_halo_sequential": round(t_seq * 1e3, 4)},
        }
        with open(json_path, "w") as f:
            f.write(json.dumps(out, indent=1) + "\n")
        print(f"wrote {json_path}")


if __name__ == "__main__":
    main()
