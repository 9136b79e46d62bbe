"""MatColoring: graph colorings of a matrix pattern.

Behavioral reference: src/mat/graphops/color — MATCOLORINGJP (jp.c,
Jones-Plassmann rounds: random weights, local maxima color in parallel),
MATCOLORINGGREEDY (greedy.c), MATCOLORINGPOWER (power.c: color A^k),
MATCOLORINGNATURAL, and the ordering-driven greedy variants SL/LF/ID
(degree-based orderings, color.c). Colorings are DISTANCE-2 by default on
the column-intersection graph (the Jacobian-compression contract of
MatFDColoring) — pass dist1=True adjacency to color a plain graph.

TPU shape: coloring is host-symbolic setup (like every graph phase); JP
is implemented as vectorized whole-graph rounds (the SIMD formulation) —
the same data-parallel structure the reference uses across ranks."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def _column_graph(S):
    """Distance-2 adjacency: columns sharing a row (C = S^T S, no diag)."""
    P = sp.csr_matrix((np.ones_like(S.data), S.indices, S.indptr),
                      shape=S.shape)
    C = (P.T @ P).tocsr()
    C.setdiag(0)
    C.eliminate_zeros()
    return C


def greedy_color(C, order=None):
    """Sequential greedy on adjacency C in the given order (greedy.c)."""
    n = C.shape[0]
    order = np.arange(n) if order is None else np.asarray(order)
    colors = np.full(n, -1, dtype=np.int64)
    for v in order:
        nbr = C.indices[C.indptr[v]:C.indptr[v + 1]]
        used = set(int(c) for c in colors[nbr] if c >= 0)
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    return colors


def jp_color(C, seed=0):
    """Jones-Plassmann (jp.c): every vertex gets a random priority; each
    round, uncolored vertices that beat all uncolored neighbors form an
    independent set and take their smallest available color simultaneously.
    Vectorized whole-graph rounds (no sequential vertex loop)."""
    n = C.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    rng = np.random.default_rng(seed)
    w = rng.permutation(n)
    colors = np.full(n, -1, dtype=np.int64)
    indptr, indices = C.indptr, C.indices
    rows = np.repeat(np.arange(n), np.diff(indptr))
    while (colors < 0).any():
        unc = colors < 0
        wn = np.where(unc[indices], w[indices], -1)
        nbr_max = np.full(n, -1, dtype=np.int64)
        np.maximum.at(nbr_max, rows, wn)
        winners = unc & (w > nbr_max)
        if not winners.any():      # isolated leftovers (no uncolored nbrs)
            winners = unc
        active = winners.copy()
        c = 0
        while active.any():
            has_c = np.zeros(n, dtype=bool)
            sel = colors[indices] == c
            if sel.any():
                has_c[rows[sel]] = True
            take = active & ~has_c
            colors[take] = c
            active &= ~take
            c += 1
    return colors


def power_graph(S, k):
    """Pattern of C^k for MATCOLORINGPOWER (power.c)."""
    C = _column_graph(S)
    B = sp.csr_matrix((np.ones_like(C.data), C.indices, C.indptr),
                      shape=C.shape)
    G = B.copy()
    for _ in range(k - 1):
        G = ((G @ B) + B).tocsr()
    G.setdiag(0)
    G.eliminate_zeros()
    return G


class MatColoring:
    """MatColoringCreate/SetType/Apply (color.c). Returns per-column
    colors (the ISColoring role as one int array)."""

    TYPES = ("jp", "greedy", "natural", "sl", "lf", "id", "power")

    def __init__(self, mat=None, ctype="greedy"):
        self.mat = mat
        self.ctype = ctype
        self.dist = 2
        self.power_k = 2

    @classmethod
    def create(cls, mat=None):
        return cls(mat)

    def setType(self, t):
        if t not in self.TYPES:
            from ..sys.error import Error
            raise Error(f"unknown MatColoring type {t}")
        self.ctype = t
        return self

    def setDistance(self, d):
        self.dist = int(d)
        return self

    def apply(self, mat=None):
        A = mat if mat is not None else self.mat
        S = A.to_scipy().tocsr()
        if self.ctype == "natural":
            return np.arange(S.shape[1], dtype=np.int64)
        if self.ctype == "power":
            return greedy_color(power_graph(S, self.power_k))
        C = _column_graph(S) if self.dist == 2 else _strip_diag(S)
        if self.ctype == "jp":
            return jp_color(C)
        deg = np.diff(C.indptr)
        if self.ctype == "lf":       # largest-first ordering
            return greedy_color(C, np.argsort(-deg, kind="stable"))
        if self.ctype == "id":       # incidence-degree ≈ ascending degree
            return greedy_color(C, np.argsort(deg, kind="stable"))
        if self.ctype == "sl":       # smallest-last ordering
            return greedy_color(C, _smallest_last_order(C))
        return greedy_color(C)

    def validate(self, colors, mat=None):
        """No two adjacent (distance-dist) columns share a color."""
        A = mat if mat is not None else self.mat
        S = A.to_scipy().tocsr()
        C = _column_graph(S) if self.dist == 2 else _strip_diag(S)
        rows = np.repeat(np.arange(C.shape[0]), np.diff(C.indptr))
        return bool(np.all(colors[rows] != colors[C.indices]))


def _strip_diag(S):
    """Distance-1 adjacency: the matrix pattern without self-loops (a
    diagonal entry would make every vertex adjacent to itself, breaking
    both JP's local-max test and validate)."""
    C = sp.csr_matrix(S, copy=True)
    C.setdiag(0)
    C.eliminate_zeros()
    return C


def _smallest_last_order(C):
    """Smallest-last vertex ordering (Matula-Beck): repeatedly remove the
    min-degree vertex; color in reverse removal order."""
    n = C.shape[0]
    deg = np.diff(C.indptr).astype(np.int64).copy()
    removed = np.zeros(n, dtype=bool)
    order = np.zeros(n, dtype=np.int64)
    import heapq
    heap = [(int(d), v) for v, d in enumerate(deg)]
    heapq.heapify(heap)
    k = n - 1
    while heap:
        d, v = heapq.heappop(heap)
        if removed[v] or d != deg[v]:
            continue
        removed[v] = True
        order[k] = v
        k -= 1
        nbr = C.indices[C.indptr[v]:C.indptr[v + 1]]
        for u in nbr[~removed[nbr]]:
            deg[u] -= 1
            heapq.heappush(heap, (int(deg[u]), int(u)))
    return order
