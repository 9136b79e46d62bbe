"""KSPFETIDP: dual-primal finite element tearing and interconnect.

Behavioral reference: src/ksp/ksp/impls/fetidp (KSPFETIDP built on
PCBDDC's machinery): on a MATIS operator, glue the PRIMAL (corner) dofs,
tear the remaining interface dofs, and solve the dual interface problem

    F lambda = d,   F = B Ktilde^{-1} B^T,
    d = B Ktilde^{-1} f,

by CG (F is SPD for SPD K_i), where B is the signed jump operator over
duplicated interface dofs and Ktilde is the block-diagonal of subdomain
Neumann matrices with the primal dofs ASSEMBLED. Ktilde^{-1} is applied
through the same algebra as PCBDDC: eliminate the non-primal blocks with
the cached K_qq^{-1}, solve the assembled primal Schur complement
(exactly the BDDC coarse matrix Phi^T K Phi), back-substitute. The
multiplicity-weighted lumped preconditioner B D K D B^T accelerates the
dual CG. Finally u = Ktilde^{-1}(f - B^T lambda), continuous by
construction of lambda.

Host-orchestrated (host_driven KSP path): subdomain blocks are small and
dense after the BDDC-style factorization; correctness and the published
H/h-polylog iteration counts are the contract, the device path for the
batched version is shared with pc/bddc.py.
"""

from __future__ import annotations

import numpy as np

from ..sys.error import Error, KSPConvergedReason as KR


def _fetidp_setup(M):
    """Shared with PCBDDC's primal selection; returns the per-subdomain
    factored pieces + the jump operator."""
    mats, maps = M.getLocalMats()
    mult = M.interface_multiplicity()
    primal = set(np.where(mult >= 3)[0].tolist())
    for gi in maps:
        gi = np.asarray(gi)
        if not primal.intersection(gi.tolist()):
            iface = gi[mult[gi] >= 2]
            if len(iface):
                primal.add(int(iface[0]))
    primal_glob = np.asarray(sorted(primal), dtype=np.int64)
    g2p = {int(g): i for i, g in enumerate(primal_glob)}
    nP = len(primal_glob)

    subs = []
    Kc = np.zeros((nP, nP))
    # jump constraints: for each torn (dual) dof, chain copies
    copies: dict[int, list] = {}
    for s, (Ai, gi) in enumerate(zip(mats, maps)):
        K = Ai.toarray() if hasattr(Ai, "toarray") else np.asarray(Ai)
        gi = np.asarray(gi, dtype=np.int64)
        isp = np.asarray([int(g) in g2p for g in gi])
        p = np.where(isp)[0]
        q = np.where(~isp)[0]
        Kqq_inv = np.linalg.inv(K[np.ix_(q, q)] + 1e-12 * np.eye(len(q)))
        Kqp = K[np.ix_(q, p)]
        Kpq = K[np.ix_(p, q)]
        Kpp = K[np.ix_(p, p)]
        Sc = Kpp - Kpq @ Kqq_inv @ Kqp
        pg = np.asarray([g2p[int(gi[j])] for j in p], dtype=np.int64)
        Kc[np.ix_(pg, pg)] += Sc
        subs.append(dict(K=K, g=gi, p=p, q=q, Kqq_inv=Kqq_inv, Kqp=Kqp,
                         Kpq=Kpq, pg=pg))
        for jloc in q:
            gd = int(gi[jloc])
            if mult[gd] >= 2:
                copies.setdefault(gd, []).append((s, int(jloc)))
    Kc_inv = np.linalg.inv(Kc + 1e-12 * np.eye(max(nP, 1)))
    lam_rows = []          # (s_a, j_a, s_b, j_b): u_a - u_b = 0
    for gd, cps in copies.items():
        for k in range(1, len(cps)):
            lam_rows.append((cps[0][0], cps[0][1], cps[k][0], cps[k][1]))
    return subs, Kc_inv, nP, lam_rows, mult


def _ktilde_solve(subs, Kc_inv, nP, rhs_loc):
    """w = Ktilde^{-1} r for per-subdomain rhs blocks rhs_loc[s]."""
    rp = np.zeros(nP)
    tmp = []
    for s, sub in enumerate(subs):
        rq = rhs_loc[s][sub["q"]]
        t = sub["Kqq_inv"] @ rq
        tmp.append(t)
        rp_s = rhs_loc[s][sub["p"]] - sub["Kpq"] @ t
        np.add.at(rp, sub["pg"], rp_s)
    wp = Kc_inv @ rp
    out = []
    for s, sub in enumerate(subs):
        w = np.zeros_like(rhs_loc[s])
        wp_s = wp[sub["pg"]]
        w[sub["p"]] = wp_s
        w[sub["q"]] = tmp[s] - sub["Kqq_inv"] @ (sub["Kqp"] @ wp_s)
        out.append(w)
    return out


def solve_fetidp_host(ksp, b_np, x0_np):
    from ..mat.utility import MatIS
    M = ksp.mat
    if not isinstance(M, MatIS):
        raise Error("KSPFETIDP requires a MATIS operator")
    subs, Kc_inv, nP, lam_rows, mult = _fetidp_setup(M)
    nlam = len(lam_rows)
    n = M.getSize()[0]

    def split_rhs(b):
        """Weighted tearing of the assembled rhs: sum R^T f_i = b."""
        return [b[sub["g"]] / mult[sub["g"]] for sub in subs]

    def Bt(lam):
        """B^T lambda as per-subdomain blocks."""
        out = [np.zeros(len(sub["g"])) for sub in subs]
        for r, (sa, ja, sb, jb) in enumerate(lam_rows):
            out[sa][ja] += lam[r]
            out[sb][jb] -= lam[r]
        return out

    def Bdot(w):
        """B w (jump of the subdomain blocks)."""
        lam = np.zeros(nlam)
        for r, (sa, ja, sb, jb) in enumerate(lam_rows):
            lam[r] = w[sa][ja] - w[sb][jb]
        return lam

    def Fdot(lam):
        return Bdot(_ktilde_solve(subs, Kc_inv, nP, Bt(lam)))

    # lumped preconditioner: B D K D B^T
    def Mprec(lam):
        blocks = Bt(lam)
        out = []
        for s, sub in enumerate(subs):
            d = 1.0 / mult[sub["g"]]
            out.append(d * (sub["K"] @ (d * blocks[s])))
        return Bdot(out)

    f_loc = split_rhs(np.asarray(b_np)[:n])
    d = Bdot(_ktilde_solve(subs, Kc_inv, nP, f_loc))

    # ---- CG on the dual problem ----
    lam = np.zeros(nlam)
    r = d.copy()
    z = Mprec(r)
    p = z.copy()
    rz = float(np.dot(r, z))
    rnorm0 = float(np.linalg.norm(r))
    hist = [rnorm0]
    its = 0
    reason = 0
    ttol = max(ksp.rtol * rnorm0, ksp.abstol)
    if nlam == 0 or rnorm0 == 0.0:
        reason = int(KR.CONVERGED_ATOL)
    while reason == 0 and its < ksp.max_it:
        Fp = Fdot(p)
        denom = float(np.dot(p, Fp))
        if denom <= 0:
            reason = int(KR.DIVERGED_INDEFINITE_MAT)
            break
        alpha = rz / denom
        lam += alpha * p
        r -= alpha * Fp
        its += 1
        rn = float(np.linalg.norm(r))
        hist.append(rn)
        if rn <= ttol:
            reason = int(KR.CONVERGED_ATOL if rn < ksp.abstol
                         else KR.CONVERGED_RTOL)
            break
        z = Mprec(r)
        rz_new = float(np.dot(r, z))
        p = z + (rz_new / rz) * p
        rz = rz_new
    if reason == 0:
        reason = int(KR.DIVERGED_ITS)

    # ---- recover the primal solution ----
    rhs = [f - bt for f, bt in zip(f_loc, Bt(lam))]
    w = _ktilde_solve(subs, Kc_inv, nP, rhs)
    x = np.zeros(len(b_np))
    cnt = np.zeros(n)
    for s, sub in enumerate(subs):
        x[sub["g"]] += w[s]
        cnt[sub["g"]] += 1.0
    x[:n] /= np.maximum(cnt, 1.0)      # copies agree; average is exact
    rnorm = hist[-1]
    return x, its, rnorm, reason, hist, rnorm0
