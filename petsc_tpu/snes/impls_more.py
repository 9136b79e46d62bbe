"""Additional SNES types: fas (nonlinear multigrid), vinewtonrsls
(variational inequality, reduced-space active set), ncg, composite, ms.

Behavioral references: src/snes/impls/fas (full approximation scheme:
pre-smooth, restrict state+residual, tau-corrected coarse solve,
prolongate correction, post-smooth), impls/vi/rs (SNESVINEWTONRSLS —
active-set reduced space Newton with projection onto [xl, xu]), impls/ncg,
impls/composite.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..sys.error import Error, SNESConvergedReason as SR
from .snes import SNES, _finish, _ksp_solve_newton


# ---------------------------------------------------------------------
# FAS: nonlinear multigrid (full approximation scheme)
# ---------------------------------------------------------------------

def solve_fas(snes: SNES, x_np, x):
    """FAS V-cycle iteration. Requires a DM hierarchy on snes.dm (DMDA)
    and a residual the DM can evaluate on each level: user sets
    snes.setFASResiduals([f_level0(fine), f_level1, ...]) or a factory via
    snes.fas_residual_factory(da) -> fn."""
    das, residuals, res_jax = _fas_hierarchy(snes)
    nlev = len(das)
    smooth_its = 4

    def smooth(lvl, u, b, its):
        """Damped nonlinear Jacobi: u += w*D(u)^-1 (b-F(u)) with the TRUE
        Jacobian diagonal extracted by 2^dim-coloring JVP probes (exact for
        width-1 stencil residuals)."""
        f = residuals[lvl]
        d = _fas_node_diag(res_jax[lvl], u, tuple(das[lvl].sizes[::-1]))
        d = np.where(np.abs(d) < 1e-12, 1.0, d)
        for _ in range(its):
            r = b - f(u)
            u = u + 0.6 * r / d
        return u

    def cycle(lvl, u, b):
        f = residuals[lvl]
        if lvl == nlev - 1:
            return smooth(lvl, u, b, 20)
        u = smooth(lvl, u, b, smooth_its)
        r = b - f(u)
        P = das[lvl].createInterpolation(das[lvl + 1])
        from ..ops import operator
        Pop = operator.bind(P.meta, P.device_data())
        restrict = Pop.mult_t if Pop.mult_t is not None else None
        # full-weighting residual restriction: P^T scaled to row-sum 1,
        # consistent with REDISCRETIZED (h-independent-coefficient) coarse
        # operators (classical FD-FAS; Galerkin coarse ops would use raw P^T)
        rc = np.asarray(restrict(jnp.asarray(r))) * getattr(snes, 'fas_rscale', 0.75)
        # state restriction by INJECTION (DMCreateInjection — the PETSc
        # FAS default): coarse state = fine state at coincident nodes
        uc0 = das[lvl].createInjection(das[lvl + 1]).np(u)
        tau = residuals[lvl + 1](uc0) + rc          # FAS tau correction
        uc = cycle(lvl + 1, uc0.copy(), tau)
        u = u + np.asarray(Pop.mult(jnp.asarray(uc - uc0)))
        u = smooth(lvl, u, b, smooth_its)
        return u

    f0 = residuals[0]
    fnorm = float(np.linalg.norm(f0(x_np)))
    snes._fnorm0 = fnorm
    snes._ttol = snes.rtol * fnorm
    snes._monitor(0, fnorm)
    reason = snes._converged(0, 0.0, 0.0, fnorm)
    it = 0
    while reason == SR.ITERATING and it < snes.max_it:
        xn = cycle(0, x_np.copy(), np.zeros_like(x_np))
        snorm = float(np.linalg.norm(xn - x_np))
        x_np = xn
        fnorm = float(np.linalg.norm(f0(x_np)))
        it += 1
        snes._monitor(it, fnorm)
        reason = snes._converged(it, float(np.linalg.norm(x_np)), snorm,
                                 fnorm)
    if reason == SR.ITERATING:
        reason = SR.DIVERGED_MAX_IT
    _finish(snes, x, x_np, it, fnorm, reason)


def _fas_hierarchy(snes):
    dm = snes.dm
    if dm is None:
        raise Error("SNES fas: attach a DMDA via setDM")
    das = [dm]
    while len(das) < getattr(snes, "fas_levels", 3):
        try:
            das.append(das[-1].coarsen())
        except Error:
            break
    factory = getattr(snes, "fas_residual_factory", None)
    if factory is None:
        raise Error("SNES fas: set snes.fas_residual_factory = "
                    "lambda da: residual_fn")
    residuals, res_jax = [], []
    for da in das:
        fn = factory(da)
        res_jax.append(fn)
        residuals.append(lambda u, fn=fn: np.asarray(fn(jnp.asarray(u))))
    return das, residuals, res_jax


def _fas_node_diag(f_jax, u, shape):
    """diag(J(u)) via 2^dim distance-1 coloring probes of jax.jvp — exact
    when the residual stencil has width <= 1 (MatFDColoring idea applied
    to the diagonal only)."""
    import jax as _jax
    x0 = jnp.asarray(u)
    grids = np.indices(shape)
    color = np.zeros(shape, dtype=np.int64)
    for ax in range(len(shape)):
        color |= (grids[ax] % 2) << ax
    color = color.reshape(-1)
    d = np.zeros_like(np.asarray(u))
    for c in range(2 ** len(shape)):
        e = (color == c).astype(np.float64)
        Je = np.asarray(_jax.jvp(f_jax, (x0,), (jnp.asarray(e),))[1])
        d = np.where(color == c, Je, d)
    return d


# ---------------------------------------------------------------------
# VI: reduced-space active-set Newton (vinewtonrsls)
# ---------------------------------------------------------------------

def solve_vinewtonrsls(snes: SNES, x_np, x):
    """Box-constrained VI: find x in [xl,xu] with F(x) complementarity
    (impls/vi/rs/virs.c): active set from x at bounds with outward F sign;
    Newton on the inactive reduced system; projected line search."""
    xl = getattr(snes, "vi_lower", None)
    xu = getattr(snes, "vi_upper", None)
    if xl is None and xu is None:
        raise Error("vinewtonrsls: call setVariableBounds")
    xl = np.full_like(x_np, -np.inf) if xl is None else np.asarray(xl)
    xu = np.full_like(x_np, np.inf) if xu is None else np.asarray(xu)
    x_np = np.clip(x_np, xl, xu)

    def proj(v):
        return np.clip(v, xl, xu)

    def vi_fnorm(xv, F):
        # projected residual norm (SNESVIComputeInactiveSetFnorm)
        act_lo = (xv <= xl + 1e-12) & (F > 0)
        act_hi = (xv >= xu - 1e-12) & (F < 0)
        Fr = np.where(act_lo | act_hi, 0.0, F)
        return float(np.linalg.norm(Fr)), ~(act_lo | act_hi)

    F = snes._func_np(x_np)
    fnorm, inact = vi_fnorm(x_np, F)
    snes._fnorm0 = fnorm
    snes._ttol = snes.rtol * fnorm
    snes._monitor(0, fnorm)
    reason = snes._converged(0, 0.0, 0.0, fnorm)
    it = 0
    while reason == SR.ITERATING and it < snes.max_it:
        J, P = snes.computeJacobian(x_np)
        # reduced system: keep inactive rows/cols, identity on active
        Ps = P.to_scipy().tolil()
        act = np.nonzero(~inact)[0]
        for a in act:
            Ps.rows[a] = [a]
            Ps.data[a] = [1.0]
        Ps = Ps.tocsr()
        Fa = np.where(inact, F, 0.0)
        from ..mat.aij import MatAIJ
        Jr = MatAIJ.from_scipy(Ps, comm=snes.comm)
        y = _ksp_solve_newton(snes, Fa, Jr, Jr)
        if y is None:
            reason = SR.DIVERGED_LINEAR_SOLVE
            break
        # projected backtracking
        lam = 1.0
        ok = False
        for _ in range(25):
            xn = proj(x_np - lam * y)
            Fn = snes._func_np(xn)
            gnorm, inact_n = vi_fnorm(xn, Fn)
            if gnorm <= (1.0 - 1e-4 * lam) * fnorm or gnorm < 1e-14:
                ok = True
                break
            lam *= 0.5
        if not ok and gnorm >= fnorm:
            reason = SR.DIVERGED_LINE_SEARCH
            break
        snorm = float(np.linalg.norm(xn - x_np))
        x_np, F, fnorm, inact = xn, Fn, gnorm, inact_n
        it += 1
        snes._monitor(it, fnorm)
        reason = snes._converged(it, float(np.linalg.norm(x_np)), snorm,
                                 fnorm)
    if reason == SR.ITERATING:
        reason = SR.DIVERGED_MAX_IT
    _finish(snes, x, x_np, it, fnorm, reason)


def setVariableBounds(snes, xl, xu):
    from ..vec.vec import Vec
    snes.vi_lower = np.asarray(xl.getArray() if isinstance(xl, Vec) else xl)
    snes.vi_upper = np.asarray(xu.getArray() if isinstance(xu, Vec) else xu)
    return snes


SNES.setVariableBounds = setVariableBounds


# ---------------------------------------------------------------------
# ncg: nonlinear conjugate gradients on F
# ---------------------------------------------------------------------

def solve_ncg(snes: SNES, x_np, x):
    """Nonlinear CG (impls/ncg, PRP+ beta) treating F as a gradient."""
    ls = snes.linesearch
    old = ls.kind
    if ls.kind == "bt":
        ls.kind = "cp"
    F = snes._func_np(x_np)
    fnorm = float(np.linalg.norm(F))
    snes._fnorm0 = fnorm
    snes._ttol = snes.rtol * fnorm
    snes._monitor(0, fnorm)
    d = F.copy()
    reason = snes._converged(0, 0.0, 0.0, fnorm)
    it = 0
    while reason == SR.ITERATING and it < snes.max_it:
        xn, Fn, gnorm, lam, ok = ls.apply(x_np, d, F, fnorm)
        if not ok and gnorm >= fnorm:
            d = F.copy()
            xn, Fn, gnorm, lam, ok = ls.apply(x_np, d, F, fnorm)
            if not ok and gnorm >= fnorm:
                reason = SR.DIVERGED_LINE_SEARCH
                break
        beta = max(0.0, float(np.dot(Fn, Fn - F) / np.dot(F, F)))
        d = Fn + beta * d
        snorm = float(np.linalg.norm(xn - x_np))
        x_np, F, fnorm = xn, Fn, gnorm
        it += 1
        snes._monitor(it, fnorm)
        reason = snes._converged(it, float(np.linalg.norm(x_np)), snorm,
                                 fnorm)
    ls.kind = old
    if reason == SR.ITERATING:
        reason = SR.DIVERGED_MAX_IT
    _finish(snes, x, x_np, it, fnorm, reason)


# ---------------------------------------------------------------------
# composite: additive/multiplicative combination of SNES types
# ---------------------------------------------------------------------

def solve_composite(snes: SNES, x_np, x):
    """Multiplicative composite (impls/composite): apply each sub-solver
    a few iterations in sequence per outer sweep. Sub-list in
    snes.composite_types (default ['nrichardson', 'newtonls'])."""
    subs = getattr(snes, "composite_types", ["nrichardson", "newtonls"])
    from ..vec.vec import Vec
    F = snes._func_np(x_np)
    fnorm = float(np.linalg.norm(F))
    snes._fnorm0 = fnorm
    snes._ttol = snes.rtol * fnorm
    snes._monitor(0, fnorm)
    reason = snes._converged(0, 0.0, 0.0, fnorm)
    it = 0
    while reason == SR.ITERATING and it < snes.max_it:
        x_old = x_np.copy()
        for st in subs:
            sub = SNES(options=snes._options)
            sub.create(snes.comm)
            sub.setType(st)
            if snes._func_pure is not None:
                sub.setFunction(snes._func_pure)
            else:
                sub.setFunction(snes._func, f=snes._fvec)
            if snes._jac is not None:
                sub.setJacobian(snes._jac, J=snes._jac_mat, P=snes._jac_pmat)
            sub.max_it = 2
            xv = Vec.from_array(x_np, comm=snes.comm)
            sub.solve(None, xv)
            x_np = np.asarray(xv.getArray())
        F = snes._func_np(x_np)
        fnorm = float(np.linalg.norm(F))
        snorm = float(np.linalg.norm(x_np - x_old))
        it += 1
        snes._monitor(it, fnorm)
        reason = snes._converged(it, float(np.linalg.norm(x_np)), snorm,
                                 fnorm)
    if reason == SR.ITERATING:
        reason = SR.DIVERGED_MAX_IT
    _finish(snes, x, x_np, it, fnorm, reason)


def solve_ngs(snes: SNES, x_np, x):
    """Nonlinear Gauss-Seidel by colored secant sweeps
    (SNESComputeNGSDefaultSecant, impls/ngs): per color c, one residual
    probe estimates the pointwise Jacobian diagonal; color-c unknowns take
    a Newton update simultaneously (distance-1-independent, so this IS
    multicolor GS)."""
    colors = _ngs_colors(snes, len(x_np))
    ncolor = int(colors.max()) + 1
    h = 1e-8
    sweeps = getattr(snes, "ngs_sweeps", 1)
    F = snes._func_np(x_np)
    fnorm = float(np.linalg.norm(F))
    snes._fnorm0 = fnorm
    snes._ttol = snes.rtol * fnorm
    snes._monitor(0, fnorm)
    reason = snes._converged(0, 0.0, 0.0, fnorm)
    it = 0
    while reason == SR.ITERATING and it < snes.max_it:
        x_old = x_np.copy()
        for _ in range(sweeps):
            for c in range(ncolor):
                sel = colors == c
                F = snes._func_np(x_np)
                xp = x_np.copy()
                xp[sel] += h
                Fp = snes._func_np(xp)
                d = (Fp - F)[sel] / h
                d = np.where(np.abs(d) < 1e-30, 1.0, d)
                x_np[sel] -= F[sel] / d
        F = snes._func_np(x_np)
        fnorm = float(np.linalg.norm(F))
        snorm = float(np.linalg.norm(x_np - x_old))
        it += 1
        snes._monitor(it, fnorm)
        reason = snes._converged(it, float(np.linalg.norm(x_np)), snorm,
                                 fnorm)
    if reason == SR.ITERATING:
        reason = SR.DIVERGED_MAX_IT
    _finish(snes, x, x_np, it, fnorm, reason)


def _ngs_colors(snes, n):
    dm = snes.dm
    if dm is not None and getattr(dm, "sizes", None) is not None:
        shape = tuple(dm.sizes[::-1])
        grids = np.indices(shape)
        color = np.zeros(shape, dtype=np.int64)
        for ax in range(len(shape)):
            color |= (grids[ax] % 2) << ax
        return color.reshape(-1)
    if snes._jac_pmat is not None and snes._jac_pmat.nnz() > 0:
        from .snes import _greedy_color
        import scipy.sparse as sp
        S = snes._jac_pmat.to_scipy()
        return _greedy_color(sp.csr_matrix(
            (np.ones_like(S.data), S.indices, S.indptr), shape=S.shape))
    return np.zeros(n, dtype=np.int64)   # dense fallback: damped Jacobi


def _nasm_subdomains(snes, n):
    nb = getattr(snes, "nasm_blocks", 2)
    ov = getattr(snes, "nasm_overlap", 1)
    sizes = np.full(nb, n // nb)
    sizes[: n % nb] += 1
    starts = np.concatenate([[0], np.cumsum(sizes)])
    doms = []
    for b in range(nb):
        lo = max(0, starts[b] - ov)
        hi = min(n, starts[b + 1] + ov)
        own = np.arange(starts[b], starts[b + 1])
        doms.append((own, np.arange(lo, hi)))
    return doms


def _nasm_correction(snes, x_np, doms):
    """Additive Schwarz corrections: solve each restricted nonlinear
    subproblem (impls/nasm) with a small inner Newton; RASM combination
    (owned parts only)."""
    from .snes import SNES as _SNES
    from ..vec.vec import Vec
    d_total = np.zeros_like(x_np)
    for own, dom in doms:
        base = x_np.copy()

        def local_res(z, dom=dom, base=base):
            xz = jnp.asarray(base).at[jnp.asarray(dom)].set(z)
            F = snes._func_pure(xz) if snes._func_pure is not None else \
                jnp.asarray(snes._func_np(np.asarray(xz)))
            return F[jnp.asarray(dom)]

        sub = _SNES(options=snes._options)
        sub.create(snes.comm)
        sub.setType("newtonls")

        def _wrapped(z, _lr=local_res):
            return _lr(z)
        _one_arg = (lambda z: _wrapped(z))
        sub.setFunction(_one_arg)
        sub.max_it = getattr(snes, "nasm_sub_its", 6)
        sub.rtol = 1e-3
        zv = Vec.from_array(x_np[dom], comm=snes.comm)
        sub.solve(None, zv)
        z = np.asarray(zv.getArray())
        corr = z - x_np[dom]
        sel = np.isin(dom, own)
        d_total[dom[sel]] += corr[sel]
    return d_total


def solve_nasm(snes: SNES, x_np, x):
    """Nonlinear additive Schwarz (impls/nasm; restricted combination)."""
    doms = _nasm_subdomains(snes, len(x_np))
    damping = getattr(snes, "nasm_damping", 1.0)
    F = snes._func_np(x_np)
    fnorm = float(np.linalg.norm(F))
    snes._fnorm0 = fnorm
    snes._ttol = snes.rtol * fnorm
    snes._monitor(0, fnorm)
    reason = snes._converged(0, 0.0, 0.0, fnorm)
    it = 0
    while reason == SR.ITERATING and it < snes.max_it:
        d = _nasm_correction(snes, x_np, doms)
        x_np = x_np + damping * d
        F = snes._func_np(x_np)
        fnorm = float(np.linalg.norm(F))
        it += 1
        snes._monitor(it, fnorm)
        reason = snes._converged(it, float(np.linalg.norm(x_np)),
                                 damping * float(np.linalg.norm(d)), fnorm)
    if reason == SR.ITERATING:
        reason = SR.DIVERGED_MAX_IT
    _finish(snes, x, x_np, it, fnorm, reason)


def _patch_subdomains(snes, n):
    """Vertex-star patches (SNESPATCH role, src/snes/impls/patch —
    nonlinear analog of PCPATCH): one patch per dof, spanning its
    Jacobian-pattern neighbors. The pattern comes from the SNES's P
    matrix (setJacobian) or an explicit `snes.patch_pattern`; without a
    pattern, falls back to size-`patch_size` windows with overlap 1."""
    A = getattr(snes, "patch_pattern", None) or \
        getattr(snes, "_jac_pmat", None)
    if A is not None and hasattr(A, "to_scipy"):
        S = A.to_scipy().tocsr()
        doms = []
        for i in range(n):
            nbr = np.unique(np.concatenate(
                [[i], S.indices[S.indptr[i]:S.indptr[i + 1]]]))
            doms.append((np.asarray([i]), nbr[nbr < n]))
        return doms
    # no pattern: one patch per dof over a +-patch_size window (every dof
    # is some patch's CENTER, since the batched solver applies only the
    # center correction)
    ps = getattr(snes, "patch_size", 2)
    doms = []
    for i in range(n):
        dom = np.arange(max(0, i - ps), min(n, i + ps + 1))
        doms.append((np.asarray([i]), dom))
    return doms


def _patch_correction_batched(snes, x_np, doms, sub_its):
    """All patches of one size solve as ONE vmapped Newton (the TPU
    reading of SNESPatch: per-patch work is data-parallel, so the patch
    loop becomes a batch dimension instead of a host loop). Patches are
    padded to their size-group; each contributes only its CENTER dof
    (partition-of-unity ownership). Needs a pure residual
    (setFunction with a jax function)."""
    import jax as _jax
    fp = snes._func_pure
    if fp is None:
        raise Error("SNES patch: set a pure jax residual (setFunction)")
    base = jnp.asarray(x_np)
    d_total = np.zeros_like(x_np)
    groups = {}
    for own, dom in doms:
        groups.setdefault(len(dom), []).append((int(own[0]), dom))
    for sz, g in groups.items():
        D = jnp.asarray(np.stack([dom for _, dom in g]))
        centers = np.asarray([c for c, _ in g])
        cpos = jnp.asarray(np.stack(
            [np.searchsorted(dom, c) for c, dom in g]))

        def one(dom, cp):
            z0 = base[dom]

            def res(z):
                return fp(base.at[dom].set(z))[dom]

            def step(z, _):
                r = res(z)
                Jl = _jax.jacfwd(res)(z)
                dz = jnp.linalg.solve(
                    Jl + 1e-14 * jnp.eye(sz, dtype=z.dtype), r)
                return z - dz, None

            z, _ = _jax.lax.scan(step, z0, None, length=sub_its)
            return (z - z0)[cp]

        corr = np.asarray(_jax.vmap(one)(D, cpos))
        d_total[centers] += corr
    return d_total


def solve_patch(snes: SNES, x_np, x):
    """SNESPATCH: nonlinear additive patch relaxation — a NASM sweep
    over vertex-star patches, batched per patch size (each patch updates
    only its center dof)."""
    doms = _patch_subdomains(snes, len(x_np))
    damping = getattr(snes, "patch_damping", 1.0)
    sub_its = getattr(snes, "patch_sub_its", 3)
    F = snes._func_np(x_np)
    fnorm = float(np.linalg.norm(F))
    snes._fnorm0 = fnorm
    snes._ttol = snes.rtol * fnorm
    snes._monitor(0, fnorm)
    reason = snes._converged(0, 0.0, 0.0, fnorm)
    it = 0
    while reason == SR.ITERATING and it < snes.max_it:
        d = _patch_correction_batched(snes, x_np, doms, sub_its)
        x_np = x_np + damping * d
        F = snes._func_np(x_np)
        fnorm = float(np.linalg.norm(F))
        it += 1
        snes._monitor(it, fnorm)
        reason = snes._converged(it, float(np.linalg.norm(x_np)),
                                 damping * float(np.linalg.norm(d)), fnorm)
    if reason == SR.ITERATING:
        reason = SR.DIVERGED_MAX_IT
    _finish(snes, x, x_np, it, fnorm, reason)


def solve_aspin(snes: SNES, x_np, x):
    """ASPIN (impls/nasm with SNESSetNPCSide / aspin.c role): line-searched
    outer iteration on the additive-Schwarz-preconditioned direction."""
    doms = _nasm_subdomains(snes, len(x_np))
    ls = snes.linesearch
    old = ls.kind
    if ls.kind == "bt":
        ls.kind = "l2"
    F = snes._func_np(x_np)
    fnorm = float(np.linalg.norm(F))
    snes._fnorm0 = fnorm
    snes._ttol = snes.rtol * fnorm
    snes._monitor(0, fnorm)
    reason = snes._converged(0, 0.0, 0.0, fnorm)
    it = 0
    while reason == SR.ITERATING and it < snes.max_it:
        d = _nasm_correction(snes, x_np, doms)
        xn, Fn, gnorm, lam, ok = ls.apply(x_np, -d, F, fnorm)
        if not ok and gnorm >= fnorm:
            reason = SR.DIVERGED_LINE_SEARCH
            break
        snorm = float(np.linalg.norm(xn - x_np))
        x_np, F, fnorm = xn, Fn, gnorm
        it += 1
        snes._monitor(it, fnorm)
        reason = snes._converged(it, float(np.linalg.norm(x_np)), snorm,
                                 fnorm)
    ls.kind = old
    if reason == SR.ITERATING:
        reason = SR.DIVERGED_MAX_IT
    _finish(snes, x, x_np, it, fnorm, reason)


def solve_ms(snes: SNES, x_np, x):
    """Multi-stage (RK-type) smoothing iteration on F(x)=0 (impls/ms,
    default 'ms' 3-stage scheme with Jacobi scaling): explicit pseudo-time
    stages x <- x0 - a_i tau D^-1 F(x); useful as an FAS smoother and as a
    standalone relaxation."""
    stages = getattr(snes, "ms_stages", (0.1481, 0.4, 1.0))
    tau = getattr(snes, "ms_damping", 0.6)
    colors_diag = None
    F = snes._func_np(x_np)
    fnorm = float(np.linalg.norm(F))
    snes._fnorm0 = fnorm
    snes._ttol = snes.rtol * fnorm
    snes._monitor(0, fnorm)
    reason = snes._converged(0, 0.0, 0.0, fnorm)
    it = 0
    dm = snes.dm
    while reason == SR.ITERATING and it < snes.max_it:
        if dm is not None and getattr(dm, "sizes", None) is not None \
                and snes._func_pure is not None:
            d = _fas_node_diag(snes._func_pure, x_np,
                               tuple(dm.sizes[::-1]))
            d = np.where(np.abs(d) < 1e-12, 1.0, d)
        else:
            d = np.ones_like(x_np)
        x0 = x_np.copy()
        for a in stages:
            Fs = snes._func_np(x_np)
            x_np = x0 - a * tau * Fs / d
        F = snes._func_np(x_np)
        fnorm = float(np.linalg.norm(F))
        snorm = float(np.linalg.norm(x_np - x0))
        it += 1
        snes._monitor(it, fnorm)
        reason = snes._converged(it, float(np.linalg.norm(x_np)), snorm,
                                 fnorm)
    if reason == SR.ITERATING:
        reason = SR.DIVERGED_MAX_IT
    _finish(snes, x, x_np, it, fnorm, reason)


SNES._impls.update({
    "ms": solve_ms,
    "nasm": solve_nasm,
    "patch": solve_patch,
    "aspin": solve_aspin,
    "ngs": solve_ngs,
    "fas": solve_fas,
    "vinewtonrsls": solve_vinewtonrsls,
    "vinewtonssls": solve_vinewtonrsls,
    "ncg": solve_ncg,
    "composite": solve_composite,
})
