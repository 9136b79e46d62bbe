"""MatAIJ: the workhorse sparse format (CSR canonical, ELL on device).

TPU-native redesign of MATSEQAIJ/MATMPIAIJ (reference
src/mat/impls/aij/seq/aij.h:47 SEQAIJHEADER, aij.c:1444 MatMult_SeqAIJ;
src/mat/impls/aij/mpi/mpiaij.h:40 MPIAIJHEADER, mpiaij.c:1052
MatMult_MPIAIJ):

* Host ("symbolic") state: a canonical CSR over logical rows, kept in numpy/
  scipy — this is where factorizations, SpGEMM, coarsening operate (PETSc's
  symbolic phase is host C code; ours is host numpy).
* Device ("numeric") state: padded-row ELL arrays in HBM (uniform static
  shapes, the TPU analog of MATSELL sliced-ELLPACK sell.h:45), or nnz-length
  segment-sum arrays for pathologically skewed rows.
* Distributed: PETSc's diag/offdiag split is kept — per-shard diagonal-block
  ELL (cols local, no communication) + off-diagonal ELL with compacted
  columns indexing a gathered halo (garray, mpiaij.h:63). The halo currently
  lowers to one all_gather which XLA overlaps with the diag-block SpMV;
  a neighbor-ppermute exchange plan replaces it for large meshes.
* COO assembly: setPreallocationCOO/setValuesCOO (gcreate.c:706) — symbolic
  dedupe/sort on host once, numeric scatter-add fully on device, matching
  the device-resident GPU assembly model (aijcusparse/aijkok).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .. import config
from ..ops import operator, spmv
from ..parallel.layout import Layout
from ..sys.error import Error
from ..vec.vec import InsertMode, NormType
from .mat import Mat


class MatAIJ(Mat):
    def __init__(self, comm=None, **kw):
        super().__init__(comm, **kw)
        # assembly staging (COO triplets, numpy)
        self._sti: list = []
        self._stj: list = []
        self._stv: list = []
        self._st_mode = None
        # canonical host CSR
        self._indptr = None   # (m+1,) int64
        self._indices = None  # (nnz,) int64
        self._vals = None     # (nnz,) float64 host
        # device state
        self._dev = None      # dict of jnp arrays
        self._meta = None
        # COO fast-path plan
        self._coo_plan = None
        self._kind_opt = None

    # ================= assembly =================

    def setPreallocation(self, nz=None, nnz=None):
        return self  # no-op: growth is dynamic on host

    def setValues(self, rows, cols, values, addv=InsertMode.INSERT_VALUES):
        """Stage a dense (len(rows) x len(cols)) logically-indexed block
        (MatSetValues matrix.c:1568). Negative indices are skipped (PETSc
        convention for boundary handling)."""
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        cols = np.atleast_1d(np.asarray(cols, dtype=np.int64))
        values = np.asarray(values, dtype=np.float64).reshape(len(rows), len(cols))
        ii = np.repeat(rows, len(cols))
        jj = np.tile(cols, len(rows))
        vv = values.reshape(-1)
        keep = (ii >= 0) & (jj >= 0)
        if self._st_mode is not None and self._st_mode != addv:
            raise Error("cannot mix INSERT_VALUES and ADD_VALUES in one assembly")
        self._st_mode = addv
        self._sti.append(ii[keep]); self._stj.append(jj[keep]); self._stv.append(vv[keep])

    def setValue(self, i, j, v, addv=InsertMode.INSERT_VALUES):
        self.setValues([i], [j], [[v]], addv)

    def setValuesCSR(self, indptr, indices, values):
        self._indptr = np.asarray(indptr, dtype=np.int64)
        self._indices = np.asarray(indices, dtype=np.int64)
        self._vals = np.asarray(values, dtype=np.float64)
        # canonicalize: column indices SORTED within each row — the
        # layout analyses (bdia run/slot packing, dia/hyb diagonal
        # extraction) assume it, and scipy fancy-indexed CSRs arrive
        # unsorted (round-5 bug: unsorted runs silently collided bdia
        # slots, producing a WRONG SpMV on shuffled-stencil patterns).
        # Fast path: the O(nnz) rows array is only built when some
        # adjacent pair actually decreases.
        if len(self._indices):
            dec = np.diff(self._indices) < 0
            if dec.any():
                rl = np.diff(self._indptr)
                rows = np.repeat(np.arange(len(rl), dtype=np.int64), rl)
                if (dec & (np.diff(rows) == 0)).any():
                    order = np.lexsort((self._indices, rows))
                    self._indices = self._indices[order]
                    self._vals = self._vals[order]

    def assemblyBegin(self, *a):
        pass

    def assemblyEnd(self, *a):
        self.assemble()

    def assemble(self, *a):
        """Merge staged COO triplets into canonical CSR and rebuild device
        arrays (MatAssemblyBegin/End matrix.c:6255/6318; stash and halo-plan
        construction collapse into this host step)."""
        if self._sti:
            i = np.concatenate(self._sti); j = np.concatenate(self._stj)
            v = np.concatenate(self._stv)
            if self._indptr is not None:
                # merge with existing CSR: expand back to COO
                ei = np.repeat(np.arange(self.row_layout.N, dtype=np.int64),
                               np.diff(self._indptr))
                if self._st_mode == InsertMode.INSERT_VALUES:
                    # INSERT overwrites: drop existing duplicates of staged entries
                    i = np.concatenate([ei, i]); j = np.concatenate([self._indices, j])
                    v = np.concatenate([self._vals, v])
                    self._dedupe_last_wins(i, j, v)
                else:
                    i = np.concatenate([ei, i]); j = np.concatenate([self._indices, j])
                    v = np.concatenate([self._vals, v])
                    self._dedupe_sum(i, j, v)
            elif self._st_mode == InsertMode.INSERT_VALUES:
                self._dedupe_last_wins(i, j, v)
            else:
                self._dedupe_sum(i, j, v)
            self._sti, self._stj, self._stv, self._st_mode = [], [], [], None
        if self._indptr is None:
            m = self.row_layout.N
            self._indptr = np.zeros(m + 1, dtype=np.int64)
            self._indices = np.zeros(0, dtype=np.int64)
            self._vals = np.zeros(0, dtype=np.float64)
        if not getattr(self, "host_only", False):
            self._build_device()
        else:
            # drop any lazily-built device state so a later access
            # rebuilds from the UPDATED host CSR (never apply stale values)
            self._dev = None
            self._meta = None
        from ..sys.info import info
        info(self, f"assembled: kind="
                   f"{self._meta[0] if self._meta else 'host_only'} "
                   f"nnz={self.nnz()}")
        self._assembled = True
        self.increase_state()
        return self

    def _dedupe_sum(self, i, j, v):
        m, n = self.row_layout.N, self.col_layout.N
        order = np.lexsort((j, i))
        i, j, v = i[order], j[order], v[order]
        new = np.ones(len(i), dtype=bool)
        new[1:] = (i[1:] != i[:-1]) | (j[1:] != j[:-1])
        slots = np.cumsum(new) - 1
        nun = int(slots[-1]) + 1 if len(slots) else 0
        vv = np.zeros(nun); np.add.at(vv, slots, v)
        ui, uj = i[new], j[new]
        self._indptr = np.zeros(m + 1, dtype=np.int64)
        np.add.at(self._indptr, ui + 1, 1)
        self._indptr = np.cumsum(self._indptr)
        self._indices, self._vals = uj, vv

    def _dedupe_last_wins(self, i, j, v):
        order = np.lexsort((np.arange(len(i)), j, i))  # stable by (i,j), keep order
        i, j, v = i[order], j[order], v[order]
        last = np.ones(len(i), dtype=bool)
        last[:-1] = (i[1:] != i[:-1]) | (j[1:] != j[:-1])
        self._dedupe_sum(i[last], j[last], v[last])

    # -------- COO device-resident assembly (gcreate.c:706 model) --------

    def setPreallocationCOO(self, coo_i, coo_j):
        """Symbolic phase: fix the COO pattern, build the device scatter plan.
        Subsequent setValuesCOO calls are pure device scatter-adds."""
        i = np.asarray(coo_i, dtype=np.int64); j = np.asarray(coo_j, dtype=np.int64)
        keep = (i >= 0) & (j >= 0)
        i, j = i[keep], j[keep]
        order = np.lexsort((j, i))
        si, sj = i[order], j[order]
        new = np.ones(len(si), dtype=bool)
        new[1:] = (si[1:] != si[:-1]) | (sj[1:] != sj[:-1])
        slots = np.cumsum(new) - 1
        m = self.row_layout.N
        indptr = np.zeros(m + 1, dtype=np.int64)
        np.add.at(indptr, si[new] + 1, 1)
        self._indptr = np.cumsum(indptr)
        self._indices = sj[new]
        self._vals = np.zeros(int(new.sum()))
        self._coo_plan = {
            "keep": jnp.asarray(np.nonzero(keep)[0]),
            "perm": jnp.asarray(order),
            "seg": jnp.asarray(slots, dtype=jnp.int32),
            "n_user": len(np.asarray(coo_i)),
            "nnz": len(self._vals),
        }
        self._build_device()
        self._assembled = True
        return self

    def setValuesCOO(self, values):
        """Numeric phase, fully on device."""
        plan = self._coo_plan
        if plan is None:
            raise Error("call setPreallocationCOO first")
        v = jnp.asarray(values, dtype=config.real_dtype()).reshape(-1)
        v = v[plan["keep"]]
        csr_vals = jax.ops.segment_sum(v[plan["perm"]], plan["seg"],
                                       num_segments=plan["nnz"])
        self._update_device_values(csr_vals)
        self._vals = None  # host values stale; refresh lazily
        self._csr_vals_dev = csr_vals
        self._assembled = True
        self.increase_state()
        return self

    # ================= host CSR access =================

    def getValuesCSR(self):
        self._sync_host_vals()
        return self._indptr.copy(), self._indices.copy(), self._vals.copy()

    def _sync_host_vals(self):
        if self._vals is None:
            self._vals = np.asarray(self._csr_vals_dev)

    def to_scipy(self):
        import scipy.sparse as sp
        m, n = self.getSize()
        if self._indptr is None and getattr(self, "_sharded_src", None) is not None:
            G = self._sharded_src.to_global_csr().tocsr()
            return G[:m, :n].tocsr()
        self._sync_host_vals()
        return sp.csr_matrix((self._vals, self._indices, self._indptr), shape=(m, n))

    @classmethod
    def from_scipy(cls, A, comm=None, host_only=False):
        """host_only=True keeps the matrix a HOST object (setup data for
        preconditioner construction — the Pmat role when the Amat is a
        device-generated operator) and defers any device build until
        meta/device_data is actually requested: at 512^3 the device
        coefficient upload is GBs the dev tunnel cannot move.

        CONTRACT: a host_only Pmat must be the numerically identical twin
        of the Amat it is paired with — PCMG/PCGAMG substitute the device
        Amat on the finest level precisely because of this guarantee."""
        A = A.tocsr()
        M = cls(comm)
        M.host_only = bool(host_only)
        M.setSizes(A.shape)
        M.setValuesCSR(A.indptr, A.indices, A.data)
        return M.assemble()

    def nnz(self):
        if self._indptr is not None:
            return int(self._indptr[-1])
        if getattr(self, "_sharded_src", None) is not None:
            return self._sharded_src.nnz()
        return 0

    def shardcsr(self):
        """Per-shard row-block representation for distributed SETUP
        algorithms (ShardedCSR; the role of MPIAIJHEADER's per-rank
        structures, mpiaij.h:40-74). Column indices stay in the padded
        global space (identity with logical indices — Layout pads only at
        the global tail), so no renumbering happens here."""
        import scipy.sparse as sp
        from .shardcsr import ShardedCSR
        if getattr(self, "_sharded_src", None) is not None:
            return self._sharded_src
        self._sync_host_vals()
        rl, cl = self.row_layout, self.col_layout
        blocks = []
        for s in range(rl.nshards):
            lo, hi = rl.range(s)
            p0, p1 = self._indptr[lo], self._indptr[hi]
            ip = (self._indptr[lo:hi + 1] - p0).astype(np.int64)
            if hi - lo < rl.block:
                ip = np.concatenate(
                    [ip, np.full(rl.block - (hi - lo), ip[-1],
                                 dtype=np.int64)])
            blocks.append(sp.csr_matrix(
                (self._vals[p0:p1], self._indices[p0:p1], ip),
                shape=(rl.block, cl.Npad)))
        return ShardedCSR(blocks,
                          Layout(rl.N, nshards=rl.nshards),
                          Layout(cl.N, nshards=cl.nshards))

    def getRow(self, row):
        self._sync_host_vals()
        lo, hi = self._indptr[row], self._indptr[row + 1]
        return self._indices[lo:hi].copy(), self._vals[lo:hi].copy()

    def getInfo(self):
        return {"nz_allocated": self.nnz(), "nz_used": self.nnz(),
                "memory": self.nnz() * 12.0, "assemblies": 1}

    # ================= device build =================

    def _choose_kind(self):
        if self._kind_opt is None:
            self._kind_opt = self.opt("get_string", "mat_spmv_kind", default="auto")
        if self._kind_opt != "auto":
            return self._kind_opt
        rl = np.diff(self._indptr)
        if len(rl) == 0 or rl.max() == 0:
            return "ell"
        # bs-blocked (BAIJ role, src/mat/impls/baij): dense bs x bs blocks
        if (self.row_layout.bs or 1) > 1 and self.row_layout.bs == \
                (self.col_layout.bs or 1):
            # vector-field stencil on a declared grid: fused block-stencil
            # layout beats block-ELL (no gather)
            if self._grid_offsets_block() is not None:
                return "dndb"
            return "bell"
        # grid-structured stencil (DMDA matrices): N-d coefficient arrays,
        # SpMV = fused shifted multiply-adds over the grid — XLA fuses all
        # taps into one HBM pass (~10x the 1-D DIA path in f64)
        if self._grid_offsets() is not None:
            return "dnd"
        # Banded/stencil pattern (every structured-grid operator): DIA layout —
        # each diagonal a contiguous stream, SpMV with no gather (TPU has no
        # hardware gather; DIA is ~60x faster than ELL/CSR here).
        if self._dia_offsets() is not None:
            return "dia"
        # HYB (near-stencil): high-occupancy diagonals stream gather-free,
        # residual entries spill to a narrow gather-ELL. Chip-measured 660x
        # over gather-ELL on the BASELINE config-2 (atmosmodd) class
        # (examples/csr_formulations.py E3 vs E0; PERF.md "Round-4
        # unstructured rates" table).
        if self._hyb_split() is not None:
            return "hyb"
        # RCM re-layout (r4 VERDICT item 3/weak 4): a structureless
        # PATTERN may hide a banded/stencil matrix under a permutation —
        # probe reverse-Cuthill-McKee and adopt the permuted operator
        # when it lands on a gather-free layout (dia/hyb >> any gather
        # formulation; the two O(n) perm gathers cost ~2/K of the
        # per-nnz gather they replace)
        if self._rcm_relayout() is not None:
            return "perm"
        # BDIA-ELL (banded, no extractable diagonals): gather-free block-
        # diagonal buckets + one-hot lane selects — the only formulation
        # that beats the ~27 ns/element XLA gather floor on arbitrary
        # banded patterns (PERF.md "Round-4 unstructured rates" table)
        if self._bdia_split() is not None:
            return "bdia"
        K, avg = int(rl.max()), float(rl.mean())
        return "ell" if K <= max(16, 4 * avg) else "csr"

    def _rcm_relayout(self, force=False):
        """Try RCM; return (perm, inner Mat) when the permuted matrix
        routes to a categorically faster layout, else None. Disabled by
        -mat_rcm_layout 0; `force` (explicit -mat_spmv_kind perm) adopts
        regardless of the cost model. Ref: MatOrdering genrcm.c role;
        the policy the round-4 verdict flagged as missing (rand-band
        stayed on BDIA without ever trying its own ordering machinery).

        Cache keys on BOTH the pattern and the values array identity: a
        value-only setValuesCSR on the same pattern must rebuild the
        permuted inner matrix (round-5 review: the pattern-only key
        silently multiplied with stale values). All-zero values (the
        setPreallocationCOO symbolic placeholder) decline the probe so
        the COO numeric-update path keeps a layout that supports it."""
        if getattr(self, "_rcm_probe_disabled", False):
            return None
        cache = getattr(self, "_rcm_cache", None)
        if (not force and cache is not None and cache[0] is self._indices
                and cache[2] is self._vals):
            return cache[1]
        result = None
        m, n = self.getSize()
        if (m == n and m >= (1 if force else 4096)
                and self._indptr is not None
                and len(self._indices) and np.any(self._vals)
                and self.opt("get_bool", "mat_rcm_layout", default=True)):
            import scipy.sparse as sp
            from .order import get_ordering
            p, _ = get_ordering(self, "rcm")
            A = sp.csr_matrix((self._vals, self._indices, self._indptr),
                              shape=(m, n))
            Ap = A[p][:, p].tocsr()
            inner = MatAIJ.from_scipy(Ap, host_only=True)
            inner._rcm_probe_disabled = True
            # the inner matrix must AUTO-select its layout even when the
            # outer was forced by -mat_spmv_kind perm (the global option
            # would otherwise recurse into the inner build)
            inner._kind_opt = "auto"
            ik = inner._choose_kind()
            nnz = len(self._indices)

            def est(mat, kind):
                # chip-calibrated per-element estimates (ns): dia/hyb
                # stream gather-free; bdia from its own optimizer; the
                # rest pay the ~30 ns XLA gather floor per nnz
                if kind == "dia":
                    return 0.3 * nnz
                if kind == "hyb":
                    return 0.8 * nnz
                if kind == "bdia":
                    s = mat._bdia_split()
                    return s[2] if s else self._BDIA_GATHER_NS * nnz
                return self._BDIA_GATHER_NS * nnz
            own = est(self, self._bdia_split() and "bdia" or "csr")
            perm_cost = 2 * self._BDIA_GATHER_NS * m   # gather + scatter
            if force or (ik in ("dia", "hyb", "bdia")
                         and est(inner, ik) + perm_cost < 0.7 * own):
                result = (np.asarray(p, dtype=np.int64), inner)
        self._rcm_cache = (self._indices, result, self._vals)
        return result

    def setStencilGrid(self, shape):
        """Declare that rows/cols are nodes of a structured grid with the
        given (…, ny, nx) shape, x fastest (DMDA natural ordering) —
        enables the fused N-d stencil SpMV layout. DMDA.createMatrix sets
        this automatically."""
        self._grid_shape = tuple(int(s) for s in shape)
        self._grid_off_cache = None
        self._grid_off_blk_cache = None
        if self._assembled and self._indptr is not None:
            self._build_device()
        return self

    def _grid_offsets(self):
        """Unique N-d stencil offsets if rows/cols live on a declared grid
        and the pattern decomposes exactly; else None."""
        cache = getattr(self, "_grid_off_cache", None)
        if cache is not None and cache[0] is self._indices:
            return cache[1]
        shape = getattr(self, "_grid_shape", None)
        if shape is None and getattr(self, "_dm", None) is not None:
            dm = self._dm
            if getattr(dm, "dof", 1) == 1 and dm.sizes is not None:
                shape = tuple(dm.sizes[::-1])   # (nz, ny, nx)
                self._grid_shape = shape
        if shape is None or len(shape) < 2:
            self._grid_off_cache = (self._indices, None)
            return None
        m, n = self.getSize()
        if m != n or int(np.prod(shape)) != m or len(self._indices) == 0:
            self._grid_off_cache = (self._indices, None)
            return None
        rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(self._indptr))
        ri = np.stack(np.unravel_index(rows, shape), axis=1)
        ci = np.stack(np.unravel_index(self._indices, shape), axis=1)
        d = ci - ri                              # (nnz, ndim) exact offsets
        dmax = np.abs(d).max(axis=0)
        if np.any(dmax >= np.asarray(shape)):
            self._grid_off_cache = (self._indices, None)
            return None
        uniq, inv = np.unique(d, axis=0, return_inverse=True)
        if len(uniq) > 80:
            self._grid_off_cache = (self._indices, None)
            return None
        out = (uniq, inv, rows)
        self._grid_off_cache = (self._indices, out)
        return out

    def _grid_offsets_block(self):
        """Node-space stencil offsets for bs>1 (vector-field stencils):
        rows = node*bs + component. Returns (uniq_node_offsets, inv, rows,
        bs) or None."""
        cache = getattr(self, "_grid_off_blk_cache", None)
        if cache is not None and cache[0] is self._indices:
            return cache[1]
        bs = self.row_layout.bs or 1
        shape = getattr(self, "_grid_shape", None)
        if shape is None and getattr(self, "_dm", None) is not None:
            dm = self._dm
            if getattr(dm, "dof", 1) > 1 and dm.sizes is not None:
                shape = tuple(dm.sizes[::-1])
                self._grid_shape = shape
                bs = dm.dof
        result = None
        if (shape is not None and len(shape) >= 2 and bs > 1
                and len(self._indices)):
            m, n = self.getSize()
            if m == n and int(np.prod(shape)) * bs == m:
                rows = np.repeat(np.arange(m, dtype=np.int64),
                                 np.diff(self._indptr))
                nr, nc = rows // bs, self._indices // bs
                ri = np.stack(np.unravel_index(nr, shape), axis=1)
                ci = np.stack(np.unravel_index(nc, shape), axis=1)
                d = ci - ri
                if not np.any(np.abs(d).max(axis=0) >= np.asarray(shape)):
                    uniq, inv = np.unique(d, axis=0, return_inverse=True)
                    if len(uniq) <= 80:
                        result = (uniq, inv, rows, bs)
        self._grid_off_blk_cache = (self._indices, result)
        return result

    def _dia_offsets(self):
        """Distinct diagonal offsets if the pattern is DIA-friendly, else None."""
        m, n = self.getSize()
        nnz = len(self._indices)
        if nnz == 0 or m < 8:
            return None
        rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(self._indptr))
        offs = np.unique(self._indices - rows)
        # bounded offset count and bounded fill blowup (storage = noffs*m)
        if len(offs) <= 64 and len(offs) * m <= 3 * nnz:
            return offs
        return None

    def _hyb_split(self):
        """Host analysis for the HYB layout: diagonals whose occupancy
        clears `-mat_hyb_min_occ` (default 0.15) become DIA streams; the
        rest spill to gather-ELL. Returns (kept_offsets, spill_width) or
        None when the split isn't profitable (captured < half the nnz, or
        the spill rows are wide, or the matrix is small)."""
        cache = getattr(self, "_hyb_cache", None)
        if cache is not None and cache[0] is self._indices:
            return cache[1]
        result = None
        m, n = self.getSize()
        nnz = len(self._indices)
        if m == n and nnz > 0 and m >= 512:
            min_occ = self.opt("get_real", "mat_hyb_min_occ", default=0.15)
            rows = np.repeat(np.arange(m, dtype=np.int64),
                             np.diff(self._indptr))
            offs = self._indices - rows
            u, counts = np.unique(offs, return_counts=True)
            keep = u[counts >= min_occ * m]
            if 1 <= len(keep) <= 64:
                captured = int(counts[counts >= min_occ * m].sum())
                spill_per_row = np.bincount(
                    rows[~np.isin(offs, keep)], minlength=m)
                Ks = int(spill_per_row.max()) if captured < nnz else 0
                if (captured >= 0.5 * nnz and Ks <= 8
                        and len(keep) * m <= 4 * captured):
                    result = ([int(o) for o in keep], Ks)
        self._hyb_cache = (self._indices, result)
        return result

    # chip-measured cost constants (examples/onehot_window_probe.py,
    # csr_formulations.py P1): one 128-lane one-hot select ~0.26 ns f32 /
    # ~0.6 ns f64-bitpair; one XLA element gather ~27 ns. The BDIA cost
    # model trades padded selects against spilled gathers with these.
    _BDIA_SELECT_NS = 0.6
    _BDIA_GATHER_NS = 30.0

    def _bdia_split(self):
        """Host analysis for the BDIA-ELL layout (gather-free banded):
        bucket entries by block offset j = c//128 - r//128; pick the slot
        cap Kcap and the kept-offset set J minimizing
            SELECT_NS * |J| * Kcap * m  +  GATHER_NS * spill.
        Returns (J_sorted, Kcap, est_ns) or None when no (J, Kcap) beats
        0.7x the plain gather-ELL estimate."""
        cache = getattr(self, "_bdia_cache", None)
        if cache is not None and cache[0] is self._indices:
            return cache[1]
        result = None
        m, n = self.getSize()
        nnz = len(self._indices)
        if m == n and nnz > 0 and m >= 4096:
            rows = np.repeat(np.arange(m, dtype=np.int64),
                             np.diff(self._indptr))
            j = self._indices // 128 - rows // 128
            # CSR order is (row, col)-sorted, so same-(row, j) entries are
            # consecutive: slot = position within the run
            newrun = np.empty(nnz, dtype=bool)
            newrun[0] = True
            newrun[1:] = (rows[1:] != rows[:-1]) | (j[1:] != j[:-1])
            run_id = np.cumsum(newrun) - 1
            run_start = np.nonzero(newrun)[0]
            slot = np.arange(nnz) - run_start[run_id]
            ell_est = self._BDIA_GATHER_NS * nnz
            best = (ell_est * 0.7, None)
            ju = np.unique(j)
            if len(ju) <= 256:
                for kcap in (1, 2, 3, 4, 6):
                    inslot = slot < kcap
                    cj = {int(v): int(c) for v, c in
                          zip(*np.unique(j[inslot], return_counts=True))}
                    keep = [jv for jv, c in cj.items()
                            if c * self._BDIA_GATHER_NS
                            > kcap * m * self._BDIA_SELECT_NS]
                    if not keep or len(keep) > 96:
                        continue
                    if len(keep) * kcap * m > 40 * nnz:   # memory guard
                        continue
                    captured = sum(cj[jv] for jv in keep)
                    cost = (self._BDIA_SELECT_NS * len(keep) * kcap * m
                            + self._BDIA_GATHER_NS * (nnz - captured))
                    if cost < best[0]:
                        best = (cost, (sorted(keep), kcap, cost))
                result = best[1]
        self._bdia_cache = (self._indices, result)
        return result

    def _build_device(self):
        if self.comm.nshards > 1:
            self._build_device_mpi()
            return
        m, n = self.getSize()
        kind = self._choose_kind()
        indptr, indices, vals = self._indptr, self._indices, self._vals
        rd = config.real_dtype()
        if kind == "bdia" and (m != n or len(indices) == 0):
            # bdia's x-window/roll machinery assumes a square operator and
            # a non-empty offset list; explicit -mat_spmv_kind bdia on a
            # rectangular or empty matrix falls back to ELL (ADVICE r3)
            kind = "ell"
        if kind == "perm":
            # RCM-permuted re-layout: store P and the permuted inner
            # operator; mult = scatter_P(inner.mult(gather_P(x)))
            cache = getattr(self, "_rcm_cache", None)
            pi = cache[1] if (cache is not None
                             and cache[0] is self._indices
                             and cache[2] is self._vals) else None
            if pi is None:
                # explicit -mat_spmv_kind perm: adopt unconditionally
                pi = self._rcm_relayout(force=True)
            if pi is None:
                from ..sys.error import Error
                raise Error("mat_spmv_kind perm: RCM re-layout needs a "
                            "square assembled matrix with nonzero values")
            p, inner = pi
            im, idat = inner.meta, inner.device_data()
            self._dev = {"perm": jnp.asarray(p), "inner": idat}
            self._meta = ("aij_perm", im, m, inner.row_layout.Npad,
                          self.row_layout.Npad)
            return
        if kind == "dndb":
            # block grid stencil: coefficient blocks (K, grid..., bs, bs);
            # SpMV = fused shifted block multiply-adds
            shape = self._grid_shape
            uniq, inv, rows, bs = self._grid_offsets_block()
            K = len(uniq)
            coef = np.zeros((K,) + shape + (bs, bs))
            nr = rows // bs
            multi = np.unravel_index(nr, shape)
            coef[(inv,) + multi + (rows % bs, indices % bs)] = vals
            dndb_scatter = np.ravel_multi_index(
                (inv,) + multi + (rows % bs, indices % bs),
                (K,) + shape + (bs, bs))
            lpad = tuple(int(max(0, -uniq[:, ax].min()))
                         for ax in range(len(shape)))
            rpad = tuple(int(max(0, uniq[:, ax].max()))
                         for ax in range(len(shape)))
            self._dev = {"coef": jnp.asarray(coef, dtype=rd),
                         "dndb_scatter": jnp.asarray(dndb_scatter)}
            self._meta = ("aij_dndb", shape,
                          tuple(tuple(int(v) for v in o) for o in uniq),
                          lpad, rpad, bs)
        elif kind == "dnd":
            # N-d stencil layout: one coefficient array per grid offset
            # (DMDA/fdda.c matrices); SpMV is a fused pass of shifted
            # multiply-adds — the TPU speed-of-light structured path
            shape = self._grid_shape
            uniq, inv, rows = self._grid_offsets()
            K = len(uniq)
            coef = np.zeros((K,) + shape)
            multi = np.unravel_index(rows, shape)
            coef[(inv,) + multi] = vals
            # CSR-order scatter positions for device numeric updates
            strides = np.cumprod((1,) + shape[::-1][:-1])[::-1]
            flat_in_grid = rows  # rows already flat in grid order
            dnd_scatter = inv * int(np.prod(shape)) + flat_in_grid
            lpad = tuple(int(max(0, -uniq[:, ax].min()))
                         for ax in range(len(shape)))
            rpad = tuple(int(max(0, uniq[:, ax].max()))
                         for ax in range(len(shape)))
            self._dev = {"coef": jnp.asarray(coef, dtype=rd),
                         "dnd_scatter": jnp.asarray(dnd_scatter)}
            self._meta = ("aij_dnd", shape,
                          tuple(tuple(int(v) for v in o) for o in uniq),
                          lpad, rpad, n)
        elif kind == "bell":
            # block-ELL (MATBAIJ analog, baij.h blocked CSR): group CSR
            # entries into bs x bs dense blocks; SpMV = batched small
            # matvecs over gathered x blocks
            bs = self.row_layout.bs
            mb, nb = m // bs, n // bs
            rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
            br, bc = rows // bs, indices // bs
            key = br * nb + bc
            order = np.argsort(key, kind="stable")
            uk, first = np.unique(key[order], return_index=True)
            ubr, ubc = uk // nb, uk % nb
            # block row lengths -> Kb
            brl = np.bincount(ubr, minlength=mb)
            Kb = max(int(brl.max()) if len(brl) else 0, 1)
            bpos = np.arange(len(uk)) - np.concatenate(
                [[0], np.cumsum(brl)])[ubr]
            bdata = np.zeros((mb, Kb, bs, bs))
            bidx = np.zeros((mb, Kb), dtype=np.int32)
            bidx[ubr, bpos] = ubc
            slot_of = np.searchsorted(uk, key)   # block slot per entry
            bdata[ubr[slot_of], bpos[slot_of],
                  rows % bs, indices % bs] = vals
            # CSR-order scatter for device numeric updates
            bell_scatter = (ubr[slot_of] * Kb + bpos[slot_of]) * bs * bs \
                + (rows % bs) * bs + (indices % bs)
            self._dev = {"bdata": jnp.asarray(bdata, dtype=rd),
                         "bidx": jnp.asarray(bidx),
                         "bell_scatter": jnp.asarray(bell_scatter)}
            self._meta = ("aij_bell", mb, nb, bs, Kb)
        elif kind == "dia":
            offs = self._dia_offsets()
            if offs is None:  # explicit -mat_spmv_kind dia on any pattern
                rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
                offs = np.unique(indices - rows)
            rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
            k_of = np.searchsorted(offs, indices - rows)
            dd = np.zeros((len(offs), m))
            dd[k_of, rows] = vals
            # CSR-order scatter positions for device numeric updates
            dia_scatter = k_of * m + rows
            lpad = int(max(0, -offs.min()))
            rpad = int(max(0, offs.max() + m - n))
            self._dev = {"data": jnp.asarray(dd, dtype=rd),
                         "dia_scatter": jnp.asarray(dia_scatter)}
            self._meta = ("aij_dia", m, n, tuple(int(o) for o in offs),
                          lpad, rpad)
        elif kind == "hyb":
            split = self._hyb_split()
            if split is None:   # explicit -mat_spmv_kind hyb on any pattern
                rows = np.repeat(np.arange(m, dtype=np.int64),
                                 np.diff(indptr))
                u, counts = np.unique(indices - rows, return_counts=True)
                keep = u[counts >= 0.15 * m]
                if len(keep) == 0 or len(keep) > 64:
                    keep = u[np.argsort(counts)[::-1][:min(len(u), 32)]]
                spill = np.bincount(
                    rows[~np.isin(indices - rows, keep)], minlength=m)
                split = (sorted(int(o) for o in keep),
                         int(spill.max()) if len(spill) else 0)
            offs, Ks = split
            offs = np.asarray(offs, dtype=np.int64)
            rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
            entry_off = indices - rows
            on_dia = np.isin(entry_off, offs)
            k_of = np.searchsorted(offs, entry_off[on_dia])
            dd = np.zeros((len(offs), m))
            dd[k_of, rows[on_dia]] = vals[on_dia]
            # compacted COO spill: length = nnz_spill (gathers cost ~3 ns
            # each regardless of shape — touch only spilling entries)
            srows = rows[~on_dia].astype(np.int32)
            scols = indices[~on_dia].astype(np.int32)
            nspill = len(srows)
            # one combined scatter into a flat (dia | spill) buffer so the
            # device COO numeric path refreshes both halves in one pass
            hyb_scatter = np.empty(len(indices), dtype=np.int64)
            hyb_scatter[on_dia] = k_of * m + rows[on_dia]
            hyb_scatter[~on_dia] = len(offs) * m + np.arange(nspill)
            lpad = int(max(0, -offs.min()))
            rpad = int(max(0, offs.max() + m - n))
            self._dev = {"data": jnp.asarray(dd, dtype=rd),
                         "sdata": jnp.asarray(vals[~on_dia], dtype=rd),
                         "srows": jnp.asarray(srows),
                         "scols": jnp.asarray(scols),
                         "hyb_scatter": jnp.asarray(hyb_scatter)}
            self._meta = ("aij_hyb", m, n, tuple(int(o) for o in offs),
                          lpad, rpad, nspill)
        elif kind == "bdia":
            split = self._bdia_split()
            if split is None:  # explicit -mat_spmv_kind bdia
                rows = np.repeat(np.arange(m, dtype=np.int64),
                                 np.diff(indptr))
                jall = indices // 128 - rows // 128
                ju, cnt = np.unique(jall, return_counts=True)
                keep = [int(v) for v in ju[np.argsort(cnt)[::-1][:96]]]
                split = (sorted(keep), 4, 0.0)
            J, kcap, _ = split
            G = -(-m // 128)
            rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
            j = indices // 128 - rows // 128
            newrun = np.empty(len(indices), dtype=bool)
            newrun[0] = True
            newrun[1:] = (rows[1:] != rows[:-1]) | (j[1:] != j[:-1])
            run_id = np.cumsum(newrun) - 1
            slot = np.arange(len(indices)) - np.nonzero(newrun)[0][run_id]
            Jarr = np.asarray(J, dtype=np.int64)
            jpos = np.searchsorted(Jarr, j)
            on = (jpos < len(Jarr)) & (Jarr[np.minimum(jpos, len(Jarr) - 1)]
                                       == j) & (slot < kcap)
            data = np.zeros((len(J), G * 128, kcap))
            lanes = np.zeros((len(J), G * 128, kcap), dtype=np.int32)
            data[jpos[on], rows[on], slot[on]] = vals[on]
            lanes[jpos[on], rows[on], slot[on]] = indices[on] % 128
            srows = rows[~on].astype(np.int32)
            scols = indices[~on].astype(np.int32)
            nspill = len(srows)
            # combined flat scatter (bdia slots | spill) for COO numeric
            bsz = len(J) * G * 128 * kcap
            bdia_scatter = np.empty(len(indices), dtype=np.int64)
            bdia_scatter[on] = ((jpos[on] * G * 128 + rows[on]) * kcap
                                + slot[on])
            bdia_scatter[~on] = bsz + np.arange(nspill)
            jmin, jmax = min(min(J), 0), max(max(J), 0)
            self._dev = {"data": jnp.asarray(data, dtype=rd),
                         "lanes": jnp.asarray(lanes),
                         "joffs": jnp.asarray(np.asarray(J, np.int32)),
                         "sdata": jnp.asarray(vals[~on], dtype=rd),
                         "srows": jnp.asarray(srows),
                         "scols": jnp.asarray(scols),
                         "bdia_scatter": jnp.asarray(bdia_scatter)}
            self._meta = ("aij_bdia", m, n, tuple(int(v) for v in J),
                          jmin, jmax, kcap, nspill)
        elif kind == "ell":
            rl = np.diff(indptr)
            K = max(int(rl.max()) if len(rl) else 0, 1)
            ed = np.zeros((m, K)); ei = np.zeros((m, K), dtype=np.int32)
            rows = np.repeat(np.arange(m), rl)
            pos = np.arange(len(indices)) - np.repeat(indptr[:-1], rl)
            ed[rows, pos] = vals; ei[rows, pos] = indices
            # ELL scatter plan for device numeric updates (COO path)
            ell_scatter = rows.astype(np.int64) * K + pos
            self._dev = {"data": jnp.asarray(ed, dtype=rd),
                         "idx": jnp.asarray(ei),
                         "ell_scatter": jnp.asarray(ell_scatter)}
            self._meta = ("aij_ell", m, n, K)
        else:
            rl = np.diff(indptr)
            rows = np.repeat(np.arange(m, dtype=np.int32), rl)
            self._dev = {"row_ids": jnp.asarray(rows),
                         "col_idx": jnp.asarray(indices, dtype=jnp.int32),
                         "vals": jnp.asarray(vals, dtype=rd)}
            self._meta = ("aij_csr", m, n)
        # diagonal cached for PCJacobi etc., plus its CSR positions so the
        # device-resident COO numeric path can refresh it without host sync
        self._dev["diag"] = jnp.asarray(self._diag_host(), dtype=rd)
        for_r = np.repeat(np.arange(m), np.diff(indptr))
        dpos = np.full(m, -1, dtype=np.int64)
        hit = np.nonzero(indices == for_r)[0]
        dpos[for_r[hit]] = hit
        self._dev["diag_pos"] = jnp.asarray(dpos)

    def _diag_host(self):
        m, n = self.getSize()
        d = np.zeros(m)
        for_r = np.repeat(np.arange(m), np.diff(self._indptr))
        hit = self._indices == for_r
        self._sync_host_vals()
        np.add.at(d, for_r[hit], self._vals[hit])
        return d

    def _update_device_values(self, csr_vals):
        """Refresh device arrays from new CSR values (same pattern) — the
        numeric half of the symbolic/numeric split; stays on device."""
        kind = self._meta[0]
        if kind == "aij_ell":
            m, K = self._meta[1], self._meta[3]
            flat = jnp.zeros((m * K,), dtype=csr_vals.dtype)
            self._dev["data"] = flat.at[self._dev["ell_scatter"]].set(csr_vals).reshape(m, K)
        elif kind == "aij_dia":
            m, noffs = self._meta[1], len(self._meta[3])
            flat = jnp.zeros((noffs * m,), dtype=csr_vals.dtype)
            self._dev["data"] = flat.at[self._dev["dia_scatter"]].set(csr_vals).reshape(noffs, m)
        elif kind == "aij_hyb":
            m, noffs, nspill = (self._meta[1], len(self._meta[3]),
                                self._meta[6])
            flat = jnp.zeros((noffs * m + max(nspill, 1),),
                             dtype=csr_vals.dtype)
            flat = flat.at[self._dev["hyb_scatter"]].set(csr_vals)
            self._dev["data"] = flat[:noffs * m].reshape(noffs, m)
            self._dev["sdata"] = flat[noffs * m:noffs * m + nspill]
        elif kind == "aij_bdia":
            _, m, n, J, jmin, jmax, kcap, nspill = self._meta
            G = -(-m // 128)
            bsz = len(J) * G * 128 * kcap
            flat = jnp.zeros((bsz + max(nspill, 1),), dtype=csr_vals.dtype)
            flat = flat.at[self._dev["bdia_scatter"]].set(csr_vals)
            self._dev["data"] = flat[:bsz].reshape(len(J), G * 128, kcap)
            self._dev["sdata"] = flat[bsz:bsz + nspill]
        elif kind == "aij_bell":
            _, mb, nb, bs, Kb = self._meta
            flat = jnp.zeros((mb * Kb * bs * bs,), dtype=csr_vals.dtype)
            self._dev["bdata"] = flat.at[self._dev["bell_scatter"]] \
                .set(csr_vals).reshape(mb, Kb, bs, bs)
        elif kind == "aij_dnd":
            shape, offs = self._meta[1], self._meta[2]
            K = len(offs)
            sz = int(np.prod(shape))
            flat = jnp.zeros((K * sz,), dtype=csr_vals.dtype)
            self._dev["coef"] = flat.at[self._dev["dnd_scatter"]] \
                .set(csr_vals).reshape((K,) + shape)
        elif kind == "aij_dndb":
            shape, offs, bs = self._meta[1], self._meta[2], self._meta[5]
            K = len(offs)
            sz = int(np.prod(shape)) * bs * bs
            flat = jnp.zeros((K * sz,), dtype=csr_vals.dtype)
            self._dev["coef"] = flat.at[self._dev["dndb_scatter"]] \
                .set(csr_vals).reshape((K,) + shape + (bs, bs))
        elif kind == "aij_csr":
            self._dev["vals"] = csr_vals
        else:
            raise Error(f"COO numeric update unsupported for {kind}")
        dpos = self._dev["diag_pos"]
        self._dev["diag"] = jnp.where(dpos >= 0,
                                      csr_vals[jnp.clip(dpos, 0)],
                                      jnp.zeros((), csr_vals.dtype))

    @property
    def meta(self):
        if self._meta is None and getattr(self, "host_only", False) \
                and self._indptr is not None:
            self._build_device()      # lazy escape hatch for host_only
        return self._meta

    def device_data(self):
        if self._dev is None and getattr(self, "host_only", False) \
                and self._indptr is not None:
            self._build_device()
        return self._dev

    # ================= distributed build =================

    def _build_device_mpi(self):
        """Split into diag/offdiag per shard (MPIAIJHEADER model) with
        uniform padded shapes; stack along a leading shard axis sharded over
        the mesh rows axis. Grid-structured operators take the slab path:
        coefficient arrays sharded over the slowest grid axis with
        plane-halo ppermute exchange (the DMDA 3-D decomposition of
        SURVEY §2.12 done the XLA way)."""
        if self._build_device_dnd_mpi():
            return
        Pn = self.comm.nshards
        rl_, cl_ = self.row_layout, self.col_layout
        blk, cb = rl_.block, cl_.block
        m = rl_.N
        rd = config.real_dtype()
        self._sync_host_vals()
        indptr, indices, vals = self._indptr, self._indices, self._vals
        return self._finish_build_mpi(Pn, rl_, cl_, blk, cb, m, rd,
                                      indptr, indices, vals)

    def _build_device_dnd_mpi(self):
        """Slab-sharded N-d stencil layout (returns False if not
        applicable): grid's slowest axis divided evenly over shards; apply
        = plane-halo ppermute + fused shifted multiply-adds per slab."""
        out = self._grid_offsets()
        if out is None:
            return False
        uniq, inv, rows = out
        shape = self._grid_shape
        Pn = self.comm.nshards
        nz = shape[0]
        if nz % Pn != 0:
            return False
        nzl = nz // Pn
        s = int(np.abs(uniq[:, 0]).max())
        if s > nzl:
            return False
        if self.row_layout.pad != 0:
            return False
        rd = config.real_dtype()
        K = len(uniq)
        coef = np.zeros((K,) + shape)
        multi = np.unravel_index(rows, shape)
        coef[(inv,) + multi] = self._vals
        coef = coef.reshape((K, Pn, nzl) + shape[1:]).transpose(
            (1, 0, 2) + tuple(range(3, 3 + len(shape) - 1)))
        from jax.sharding import NamedSharding
        sh = NamedSharding(self.comm.mesh,
                           P(self.comm.axis, *([None] * (len(shape) + 1))))
        sh1 = NamedSharding(self.comm.mesh, P(self.comm.axis))
        self._dev = {
            "coef": jax.device_put(jnp.asarray(coef, dtype=rd), sh),
            "diag": jax.device_put(
                jnp.asarray(self._diag_host(), dtype=rd), sh1),
        }
        lpad = tuple(int(max(0, -uniq[:, ax].min()))
                     for ax in range(1, len(shape)))
        rpad = tuple(int(max(0, uniq[:, ax].max()))
                     for ax in range(1, len(shape)))
        self._meta = ("dnd_mpi", Pn, nzl, shape,
                      tuple(tuple(int(v) for v in o) for o in uniq),
                      s, lpad, rpad, self.comm.axis, self.comm.mesh)
        return True

    def _finish_build_mpi(self, Pn, rl_, cl_, blk, cb, m, rd,
                          indptr, indices, vals):
        per_shard_coo = []
        for s in range(Pn):
            lo, hi = rl_.range(s)
            p0, p1 = indptr[lo], indptr[hi]
            rows = np.repeat(np.arange(lo, hi), np.diff(indptr[lo:hi + 1])) - lo
            per_shard_coo.append((rows, indices[p0:p1], vals[p0:p1]))
        return self._finish_build_mpi_pershard(Pn, rl_, cl_, blk, cb, rd,
                                               per_shard_coo)

    def _finish_build_mpi_pershard(self, Pn, rl_, cl_, blk, cb, rd,
                                   per_shard_coo):
        """Build the mpiaij device layout from per-shard (local rows,
        global cols, vals) COO triples — shared by the global-CSR path and
        the ShardedCSR (distributed-setup) path."""

        def row_pos(r):
            """Position of each entry within its row (r nondecreasing)."""
            if len(r) == 0:
                return np.zeros(0, dtype=np.int64)
            change = np.ones(len(r), dtype=bool)
            change[1:] = r[1:] != r[:-1]
            run_starts = np.nonzero(change)[0]
            run_lens = np.diff(np.append(run_starts, len(r)))
            return np.arange(len(r)) - np.repeat(run_starts, run_lens)

        per_shard = []
        H = 1
        deg_d, deg_o = [], []
        for s in range(Pn):
            rows, cols, v = per_shard_coo[s]
            is_diag = (cols // cb) == s
            ga = np.unique(cols[~is_diag])
            per_shard.append((rows, cols, v, is_diag, ga))
            deg_d.append(np.bincount(rows[is_diag], minlength=blk))
            deg_o.append(np.bincount(rows[~is_diag], minlength=blk))
            H = max(H, len(ga))

        # Hybrid ELL+spill widths: SPMD needs uniform static shapes, so a
        # single dense-ish row anywhere would otherwise pad EVERY shard's
        # ELL lanes to the worst-case degree (mpiaij.h:40-74 keeps
        # per-rank compressed CSR instead). Cap the lane count at the
        # storage/flops-optimal K and push long-row tails into a small
        # padded COO spill segment applied by segment_sum.
        Kd, Sd = _hyb_width(deg_d, blk)
        Ko, So = _hyb_width(deg_o, blk)

        dd_l, di_l, od_l, oi_l, ga_l = [], [], [], [], []
        spl = {k: [] for k in ("dsr", "dsc", "dsv", "osr", "osc", "osv")}
        for s in range(Pn):
            rows, cols, v, is_diag, ga = per_shard[s]
            dd = np.zeros((blk, Kd)); di = np.zeros((blk, Kd), dtype=np.int32)
            od = np.zeros((blk, Ko)); oi = np.zeros((blk, Ko), dtype=np.int32)
            gaa = np.zeros((H,), dtype=np.int64)
            gaa[: len(ga)] = ga
            for sel, dat, idxa, locf, K, S, pre in (
                (is_diag, dd, di, lambda c: c - s * cb, Kd, Sd, "d"),
                (~is_diag, od, oi, lambda c: np.searchsorted(ga, c), Ko, So,
                 "o"),
            ):
                r, c, vv = rows[sel], cols[sel], v[sel]
                pos = row_pos(r)
                fit = pos < K
                dat[r[fit], pos[fit]] = vv[fit]
                idxa[r[fit], pos[fit]] = locf(c[fit])
                if S:
                    ov = ~fit
                    sr = np.zeros(S, dtype=np.int32)
                    sc = np.zeros(S, dtype=np.int32)
                    sv = np.zeros(S)
                    nov = int(ov.sum())
                    sr[:nov] = r[ov]
                    sc[:nov] = locf(c[ov])
                    sv[:nov] = vv[ov]
                    spl[pre + "sr"].append(sr)
                    spl[pre + "sc"].append(sc)
                    spl[pre + "sv"].append(sv)
            dd_l.append(dd); di_l.append(di); od_l.append(od); oi_l.append(oi); ga_l.append(gaa)

        from jax.sharding import NamedSharding
        from ..parallel.sf import ExchangePlan
        sh3 = NamedSharding(self.comm.mesh, P(self.comm.axis, None, None))
        sh1 = NamedSharding(self.comm.mesh, P(self.comm.axis))
        # halo plan: leaves = each shard's compacted offdiag columns
        # (garray), owners resolved over the COLUMN layout (mpiaij.h:63 +
        # SF-based Mvctx construction in mmaij.c:8)
        plan = ExchangePlan(cl_, [per_shard[s][4] for s in range(Pn)],
                            axis=self.comm.axis)
        sh2 = NamedSharding(self.comm.mesh, P(self.comm.axis, None))
        spill = {}
        for k, lst in spl.items():
            if lst:
                arr = np.stack(lst)
                dt = rd if k.endswith("v") else None
                spill[k] = jax.device_put(jnp.asarray(arr, dtype=dt), sh2)
        self._dev = {
            "dd": jax.device_put(jnp.asarray(np.stack(dd_l), dtype=rd), sh3),
            "di": jax.device_put(jnp.asarray(np.stack(di_l)), sh3),
            "od": jax.device_put(jnp.asarray(np.stack(od_l), dtype=rd), sh3),
            "oi": jax.device_put(jnp.asarray(np.stack(oi_l)), sh3),
            "sp": spill,
            "sf": plan.device_tables(self.comm.mesh),
        }
        # diagonal from the per-shard triples (no global CSR required)
        diag = np.zeros(rl_.Npad)
        for s in range(Pn):
            rows, cols, v = per_shard_coo[s]
            hit = cols == rows + s * blk
            np.add.at(diag, rows[hit] + s * blk, v[hit])
        self._dev["diag"] = jax.device_put(jnp.asarray(diag, dtype=rd), sh1)
        self._meta = ("mpiaij", Pn, blk, cb, Kd, Ko, plan.H, plan.meta(),
                      self.comm.axis, self.comm.mesh, Sd, So)

    @classmethod
    def from_sharded(cls, S, comm):
        """Device-bind a ShardedCSR (per-shard setup representation) as a
        distributed MatAIJ WITHOUT ever forming a global CSR — the path
        the distributed GAMG setup uses for mid-level operators and
        prolongators (round-2; reverses the round-1 to_scipy pattern)."""
        M = cls(comm)
        rl, cl = S.row_layout, S.col_layout
        M.row_layout = Layout(rl.N, nshards=rl.nshards, axis=comm.axis)
        M.col_layout = Layout(cl.N, nshards=cl.nshards, axis=comm.axis)
        assert M.row_layout.block == rl.block, (M.row_layout, rl)
        assert M.col_layout.block == cl.block, (M.col_layout, cl)
        per_shard_coo = []
        for b in S.blocks:
            rows = np.repeat(np.arange(b.shape[0]), np.diff(b.indptr))
            per_shard_coo.append((rows, b.indices.astype(np.int64), b.data))
        rd = config.real_dtype()
        M._finish_build_mpi_pershard(rl.nshards, M.row_layout, M.col_layout,
                                     rl.block, cl.block, rd, per_shard_coo)
        M._sharded_src = S
        M._assembled = True
        return M

    # ================= algebra on host CSR =================

    def transpose(self):
        return MatAIJ.from_scipy(self.to_scipy().T.tocsr(), comm=self.comm)

    def duplicate(self, copy_values=True):
        A = self.to_scipy().copy()
        if not copy_values:
            A.data[:] = 0.0
        return MatAIJ.from_scipy(A, comm=self.comm)

    def scale(self, alpha):
        self._sync_host_vals()
        self._vals = self._vals * alpha
        self._build_device()
        self.increase_state()
        return self

    def shift(self, alpha):
        """A <- A + alpha I."""
        import scipy.sparse as sp
        m, n = self.getSize()
        A = self.to_scipy() + alpha * sp.eye(m, n, format="csr")
        self.setValuesCSR(A.indptr, A.indices, A.data)
        return self.assemble()

    def axpy(self, alpha, X: "MatAIJ", structure=None):
        A = self.to_scipy() + alpha * X.to_scipy()
        self.setValuesCSR(A.tocsr().indptr, A.tocsr().indices, A.tocsr().data)
        return self.assemble()

    def diagonalScale(self, L=None, R=None):
        import scipy.sparse as sp
        A = self.to_scipy()
        if L is not None:
            A = sp.diags(np.asarray(L.getArray())) @ A
        if R is not None:
            A = A @ sp.diags(np.asarray(R.getArray()))
        A = A.tocsr()
        self.setValuesCSR(A.indptr, A.indices, A.data)
        return self.assemble()

    def zeroRows(self, rows, diag=1.0):
        """MatZeroRows: zero the rows, put `diag` on the diagonal."""
        self._sync_host_vals()
        rows = np.asarray(rows, dtype=np.int64)
        mask = np.zeros(self.row_layout.N, dtype=bool); mask[rows] = True
        rr = np.repeat(np.arange(self.row_layout.N), np.diff(self._indptr))
        keep = ~mask[rr] | (self._indices == rr)
        vals = np.where(mask[rr] & (self._indices == rr), diag, self._vals)
        # rows lacking a diagonal entry: add it
        has_diag = np.zeros(self.row_layout.N, dtype=bool)
        has_diag[rr[(self._indices == rr)]] = True
        missing = rows[~has_diag[rows]]
        i = np.concatenate([rr[keep], missing])
        j = np.concatenate([self._indices[keep], missing])
        v = np.concatenate([vals[keep], np.full(len(missing), diag)])
        self._indptr = None
        self._dedupe_sum(i, j, v)
        return self.assemble()

    @staticmethod
    def _host_spgemm(A, B):
        """Host SpGEMM numeric through the native OpenMP Gustavson kernel
        (matmatmult.c role; graphops.cpp), scipy fallback."""
        from .. import native
        C = native.spgemm(A.tocsr(), B.tocsr())
        return C if C is not None else (A @ B).tocsr()

    def matMult(self, B, fill=None):
        """C = A*B (MatMatMult matrix.c:9373). SpGEMM is a host symbolic+
        numeric phase (native C++ Gustavson, scipy fallback) — the TPU
        consumes the RESULT as a fused device layout; sparse-times-sparse
        has no MXU mapping so the product itself stays on host (SURVEY:
        GAMG RAP strategy; measured rationale in PERF.md)."""
        C = self._host_spgemm(self.to_scipy(), B.to_scipy())
        return MatAIJ.from_scipy(C, comm=self.comm)

    def transposeMatMult(self, B, fill=None):
        """C = A^T * B (MatTransposeMatMult)."""
        from .. import native
        At = native.csr_transpose(self.to_scipy().tocsr())
        if At is None:
            At = self.to_scipy().T.tocsr()
        C = self._host_spgemm(At, B.to_scipy())
        return MatAIJ.from_scipy(C, comm=self.comm)

    def ptap(self, P, fill=None):
        """C = P^T A P (MatPtAP — the Galerkin triple product; the
        scalable two-product path of mpiptap.c:215, both products on the
        native kernel)."""
        from .. import native
        Ps = P.to_scipy().tocsr()
        Pt = native.csr_transpose(Ps)
        if Pt is None:
            Pt = Ps.T.tocsr()
        C = self._host_spgemm(Pt, self._host_spgemm(self.to_scipy(), Ps))
        return MatAIJ.from_scipy(C, comm=self.comm)

    def rart(self, R, fill=None):
        """C = R A R^T (MatRARt)."""
        from .. import native
        Rs = R.to_scipy().tocsr()
        Rt = native.csr_transpose(Rs)
        if Rt is None:
            Rt = Rs.T.tocsr()
        C = self._host_spgemm(Rs, self._host_spgemm(self.to_scipy(), Rt))
        return MatAIJ.from_scipy(C, comm=self.comm)

    def createSubMatrix(self, isrow, iscol=None):
        """MatCreateSubMatrix: extract the (isrow x iscol) block as a new
        MatAIJ (matrix.c submatrix path)."""
        rows = np.asarray(isrow, dtype=np.int64)
        cols = rows if iscol is None else np.asarray(iscol, dtype=np.int64)
        S = self.to_scipy()[rows][:, cols].tocsr()
        return MatAIJ.from_scipy(S, comm=self.comm)

    def zeroRowsColumns(self, rows, diag=1.0, x=None, b=None):
        """MatZeroRowsColumns: symmetric Dirichlet elimination — zero the
        rows AND columns, unit-scaled diagonal; with x,b given, moves the
        known-column contributions to the rhs (matrix.c semantics)."""
        rows = np.asarray(rows, dtype=np.int64)
        A = self.to_scipy().tocsr()
        if x is not None and b is not None:
            xv = np.asarray(x.getArray())[: A.shape[1]]
            mask = np.zeros(A.shape[1], dtype=bool)
            mask[rows] = True
            contrib = A @ (xv * mask)
            bv = np.asarray(b.getArray())[: A.shape[0]].copy()
            bv -= contrib
            bv[rows] = diag * xv[rows]
            b.setArray(bv)
        A = A.tolil()
        for r in rows:
            A.rows[r] = [int(r)]
            A.data[r] = [diag]
        A = A.tocsr()
        coo = A.tocoo()
        keep = ~np.isin(coo.col, rows) | (coo.row == coo.col)
        import scipy.sparse as sp
        A = sp.csr_matrix((coo.data[keep], (coo.row[keep], coo.col[keep])),
                          shape=A.shape)
        self.setValuesCSR(A.indptr, A.indices, A.data)
        return self.assemble()

    def norm(self, norm_type=NormType.NORM_FROBENIUS):
        self._sync_host_vals()
        if norm_type == NormType.NORM_FROBENIUS:
            return float(np.linalg.norm(self._vals))
        A = self.to_scipy()
        if norm_type == NormType.NORM_1:
            return float(np.abs(A).sum(axis=0).max())
        if norm_type == NormType.NORM_INFINITY:
            return float(np.abs(A).sum(axis=1).max())
        raise ValueError(norm_type)

    def convert(self, kind):
        if kind == "dense":
            from .mat import MatDense
            D = MatDense(self.comm)
            D.setSizes(self.getSize())
            D.setDenseArray(self.to_scipy().toarray())
            return D
        raise ValueError(kind)


# ================= binders =================

def _bind_aij_ell(meta, data):
    _, m, n, K = meta
    d, i = data["data"], data["idx"]
    return operator.Op(
        mult=lambda x: spmv.ell_spmv(d, i, x),
        mult_t=lambda x: spmv.ell_spmv_t(d, i, x, n),
        diag=lambda: data["diag"],
    )


# Slab size target for the blocked variable-coefficient stencil mult:
# ~4 MB x-slabs measured fastest on v5e (examples/stencil_formulations.py).
_SLAB_TARGET_BYTES = 4 * 1024 * 1024


def _bind_aij_dnd(meta, data):
    _, shape, offs, lpad, rpad, ncols = meta[:6]
    # optional per-offset CONSTANT coefficients (meta[6]): a scalar stands
    # in for the whole (shape,) plane — correct because the mult's zero
    # padding already supplies the boundary clip (stencil_build.build_dnd)
    cvals = meta[6] if len(meta) > 6 else (None,) * len(offs)
    coef = data["coef"]
    nd = len(shape)
    N = int(np.prod(shape))
    var_idx = {}
    ci = 0
    for k, c in enumerate(cvals):
        if c is None:
            var_idx[k] = ci
            ci += 1

    def _coef(k, dtype):
        c = cvals[k]
        return coef[var_idx[k]] if c is None else jnp.asarray(c, dtype)

    def _tail(y, x):
        if x.shape[0] > y.shape[0]:
            y = jnp.pad(y, (0, x.shape[0] - y.shape[0]))
        return y

    # ---- fast path 1: separable uniform-coefficient box/star stencil ----
    # When every off-diagonal coefficient is the SAME constant co and the
    # offsets form the full 3^nd box (bench_kspsolve.c's 27-pt operator) or
    # the 2*nd+1 star (ex45's 7-pt), the operator factors through 1-D
    # 3-tap box filters B_ax (zero boundary = the Dirichlet row-truncation
    # convention):
    #   box :  A x = (cd - co) x + co * (B_0 ∘ B_1 ∘ ... ∘ B_{nd-1}) x
    #   star:  A x = (cd - nd*co) x + co * (B_0 + B_1 + ... + B_{nd-1}) x
    # This replaces 3^nd shifted HBM reads of x with nd streaming passes
    # (and ~2*nd f64 adds/point instead of 3^nd FMAs — the dominant cost
    # under TPU f64 emulation). Chip-measured at 128^3 f64: 364 Gnnz/s vs
    # 58 for the 27-slice form (examples/stencil_formulations.py).
    center = (0,) * nd
    off_set = set(offs)
    star_set = {center} | {
        tuple(s if a == ax else 0 for a in range(nd))
        for ax in range(nd) for s in (-1, 1)}
    from itertools import product as _prod
    box_set = set(_prod((-1, 0, 1), repeat=nd))
    offdiag = {cvals[k] for k, o in enumerate(offs) if any(o)}
    all_const = all(c is not None for c in cvals)

    if (all_const and center in off_set and len(offdiag) == 1
            and next(iter(offdiag)) is not None
            and off_set in (box_set, star_set)):
        cd = float(cvals[offs.index(center)])
        co = float(next(iter(offdiag)))
        is_box = off_set == box_set

        def _box1(v, ax):
            n_ax = shape[ax]
            pads = [(0, 0)] * nd
            pads[ax] = (1, 1)
            vp = jnp.pad(v, pads)
            return (jax.lax.slice_in_dim(vp, 0, n_ax, axis=ax)
                    + jax.lax.slice_in_dim(vp, 1, n_ax + 1, axis=ax)
                    + jax.lax.slice_in_dim(vp, 2, n_ax + 2, axis=ax))

        def mult(x):
            v = x[:N].reshape(shape)
            if is_box:
                s = v
                for ax in range(nd):
                    s = _box1(s, ax)
                y = (cd - co) * v + co * s
            else:
                s = _box1(v, 0)
                for ax in range(1, nd):
                    s = s + _box1(v, ax)
                y = (cd - nd * co) * v + co * s
            return _tail(y.reshape(-1), x)

        # symmetric offset pattern + uniform coefficients: A^T = A exactly
        # (the Dirichlet clip is symmetric — entry (i, i+o) exists iff
        # (i+o, i) does)
        return operator.Op(mult=mult, mult_t=mult, diag=lambda: data["diag"])

    # ---- fast path 2: slab-blocked taps (variable-coefficient grids) ----
    # Chunk the leading grid axis so the padded x slab stays VMEM-resident
    # across all tap reads while coefficient planes stream from HBM exactly
    # once: x traffic drops K-fold vs the all-at-once form. Chip-measured
    # 27-pt variable-coefficient f64 at 128^3: 46 Gnnz/s vs 32
    # (examples/stencil_formulations.py; ~4 MB slabs are the sweet spot).
    plane_bytes = int(np.prod(shape[1:])) * 8 if nd >= 2 else 0
    cz = 0
    if nd >= 2 and plane_bytes > 0:
        cz = max(1, min(shape[0], _SLAB_TARGET_BYTES // plane_bytes))
    use_slab = nd >= 2 and cz >= 1 and shape[0] >= 2 * cz and var_idx

    if use_slab:
        nchunk = -(-shape[0] // cz)
        pz = lpad[0] + rpad[0]
        rest = tuple(shape[1:])

        def mult(x):
            v = x[:N].reshape(shape)
            vp = jnp.pad(v, tuple(zip(lpad, rpad)))
            prest = vp.shape[1:]
            zeros_rest = (0,) * (nd - 1)

            def body(ci_, acc):
                # clamp the last chunk; overlapping rows recompute the
                # same values, so the overwrite is exact
                z0 = jnp.minimum(ci_ * cz, shape[0] - cz)
                xc = jax.lax.dynamic_slice(
                    vp, (z0,) + zeros_rest, (cz + pz,) + tuple(prest))
                cs = jax.lax.dynamic_slice(
                    coef, (0, z0) + zeros_rest,
                    (coef.shape[0], cz) + rest) if coef.shape[0] else None
                a = jnp.zeros((cz,) + rest, x.dtype)
                for k, off in enumerate(offs):
                    c = cvals[k]
                    cv = cs[var_idx[k]] if c is None \
                        else jnp.asarray(c, x.dtype)
                    start = tuple(lpad[ax] + off[ax] for ax in range(nd))
                    a = a + cv * jax.lax.dynamic_slice(
                        xc, start, (cz,) + rest)
                return jax.lax.dynamic_update_slice(
                    acc, a, (z0,) + zeros_rest)

            out = jax.lax.fori_loop(
                0, nchunk, body, jnp.zeros(shape, x.dtype))
            return _tail(out.reshape(-1), x)
    else:
        def mult(x):
            v = x[:N].reshape(shape)
            vp = jnp.pad(v, tuple(zip(lpad, rpad)))
            acc = jnp.zeros(shape, dtype=x.dtype)
            for k, off in enumerate(offs):
                start = tuple(lpad[ax] + off[ax] for ax in range(nd))
                acc = acc + _coef(k, x.dtype) \
                    * jax.lax.dynamic_slice(vp, start, shape)
            return _tail(acc.reshape(-1), x)

    def mult_t(x):
        v = x[: int(np.prod(shape))].reshape(shape)
        P = tuple(shape[ax] + lpad[ax] + rpad[ax] for ax in range(nd))
        acc = jnp.zeros(P, dtype=x.dtype)
        for k, off in enumerate(offs):
            start = tuple(lpad[ax] + off[ax] for ax in range(nd))
            seg = jax.lax.dynamic_slice(acc, start, shape)
            acc = jax.lax.dynamic_update_slice(
                acc, seg + _coef(k, x.dtype) * v, start)
        sl = tuple(slice(lpad[ax], lpad[ax] + shape[ax]) for ax in range(nd))
        y = acc[sl].reshape(-1)
        if x.shape[0] > y.shape[0]:
            y = jnp.pad(y, (0, x.shape[0] - y.shape[0]))
        return y

    return operator.Op(mult=mult, mult_t=mult_t, diag=lambda: data["diag"])


def _bind_aij_dndb(meta, data):
    _, shape, offs, lpad, rpad, bs = meta
    coef = data["coef"]
    nd = len(shape)
    nnode = int(np.prod(shape))

    def mult(x):
        v = x[: nnode * bs].reshape(shape + (bs,))
        vp = jnp.pad(v, tuple(zip(lpad, rpad)) + ((0, 0),))
        acc = jnp.zeros(shape + (bs,), dtype=x.dtype)
        for k, off in enumerate(offs):
            start = tuple(lpad[ax] + off[ax] for ax in range(nd)) + (0,)
            sl = jax.lax.dynamic_slice(vp, start, shape + (bs,))
            acc = acc + jnp.einsum("...ij,...j->...i", coef[k], sl)
        y = acc.reshape(-1)
        if x.shape[0] > y.shape[0]:
            y = jnp.pad(y, (0, x.shape[0] - y.shape[0]))
        return y

    def mult_t(x):
        v = x[: nnode * bs].reshape(shape + (bs,))
        P = tuple(shape[ax] + lpad[ax] + rpad[ax] for ax in range(nd))
        acc = jnp.zeros(P + (bs,), dtype=x.dtype)
        for k, off in enumerate(offs):
            start = tuple(lpad[ax] + off[ax] for ax in range(nd)) + (0,)
            contrib = jnp.einsum("...ij,...i->...j", coef[k], v)
            seg = jax.lax.dynamic_slice(acc, start, shape + (bs,))
            acc = jax.lax.dynamic_update_slice(acc, seg + contrib, start)
        sl = tuple(slice(lpad[ax], lpad[ax] + shape[ax])
                   for ax in range(nd)) + (slice(None),)
        y = acc[sl].reshape(-1)
        if x.shape[0] > y.shape[0]:
            y = jnp.pad(y, (0, x.shape[0] - y.shape[0]))
        return y

    return operator.Op(mult=mult, mult_t=mult_t, diag=lambda: data["diag"])


def _bind_aij_bell(meta, data):
    _, mb, nb, bs, Kb = meta
    bd, bi = data["bdata"], data["bidx"]

    def mult(x):
        xb = x[: nb * bs].reshape(nb, bs)
        gathered = xb[bi]                       # (mb, Kb, bs)
        y = jnp.einsum("mkij,mkj->mi", bd, gathered)
        if x.shape[0] > mb * bs:
            return jnp.pad(y.reshape(-1), (0, x.shape[0] - mb * bs))
        return y.reshape(-1)

    def mult_t(x):
        xb = x[: mb * bs].reshape(mb, bs)
        contrib = jnp.einsum("mkij,mi->mkj", bd, xb)   # (mb, Kb, bs)
        y = jnp.zeros((nb, bs), dtype=x.dtype)
        y = y.at[bi.reshape(-1)].add(contrib.reshape(-1, bs))
        if x.shape[0] > nb * bs:
            return jnp.pad(y.reshape(-1), (0, x.shape[0] - nb * bs))
        return y.reshape(-1)

    return operator.Op(mult=mult, mult_t=mult_t, diag=lambda: data["diag"])


def _bind_aij_dia(meta, data):
    _, m, n, offsets, lpad, rpad = meta
    d = data["data"]
    return operator.Op(
        mult=lambda x: spmv.dia_spmv(d, offsets, x, m, lpad, rpad),
        mult_t=lambda x: spmv.dia_spmv_t(d, offsets, x, n, m, lpad, rpad),
        diag=lambda: data["diag"],
    )


def _bind_aij_hyb(meta, data):
    _, m, n, offsets, lpad, rpad, nspill = meta[:7]
    d = data["data"]
    sd = data["sdata"] if nspill > 0 else None
    si = (data["srows"], data["scols"]) if nspill > 0 else None
    return operator.Op(
        mult=lambda x: spmv.hyb_spmv(d, offsets, sd, si, x, m, lpad, rpad),
        mult_t=lambda x: spmv.hyb_spmv_t(d, offsets, sd, si, x, n, m,
                                         lpad, rpad),
        diag=lambda: data["diag"],
    )


def _bind_aij_bdia(meta, data):
    _, m, n, J, jmin, jmax, kcap, nspill = meta
    d, l, jo = data["data"], data["lanes"], data["joffs"]
    spill = ((data["srows"], data["scols"], data["sdata"])
             if nspill > 0 else None)
    return operator.Op(
        mult=lambda x: spmv.bdia_spmv(jo, jmin, jmax, d, l, spill, x, m),
        mult_t=lambda x: spmv.bdia_spmv_t(jo, jmin, jmax, d, l, spill,
                                          x, m, n),
        diag=lambda: data["diag"],
    )


def _bind_aij_csr(meta, data):
    _, m, n = meta
    r, c, v = data["row_ids"], data["col_idx"], data["vals"]
    return operator.Op(
        mult=lambda x: spmv.csr_seg_spmv(r, c, v, x, m),
        mult_t=lambda x: spmv.csr_seg_spmv_t(r, c, v, x, n),
        diag=lambda: data["diag"],
    )


def _hyb_width(deg_list, blk, spill_cost=4):
    """Pick the ELL lane count K for a hybrid ELL+spill layout.

    Minimizes  blk*K  (uniform padded lanes, the per-shard SpMV flops)
    +  spill_cost * max_s spill_s(K)  (the COO spill segment is padded
    to the max across shards and costs a gather + scatter-add per
    entry).  Returns (K, max_spill).  With no long-row outliers this
    degenerates to the plain worst-case ELL of round 1 (spill 0)."""
    degs = [np.asarray(d, dtype=np.int64) for d in deg_list if len(d)]
    if not degs:
        return 1, 0
    kmax = max(int(d.max()) for d in degs)
    if kmax <= 1:
        return 1, 0
    cands = sorted({1, kmax} | {int(v) for d in degs
                                for v in np.unique(d) if 0 < v < kmax})
    best_k, best_cost, best_spill = kmax, blk * kmax, 0
    for k in cands:
        spill = max(int(np.maximum(d - k, 0).sum()) for d in degs)
        cost = blk * k + spill_cost * spill
        if cost < best_cost:
            best_k, best_cost, best_spill = k, cost, spill
    return best_k, best_spill


def _bind_dnd_mpi(meta, data):
    from jax import shard_map
    from jax import lax
    (_, Pn, nzl, shape, offs, s, lpad, rpad, axis, mesh) = meta
    tail = shape[1:]
    nd = len(shape)
    slab = (nzl,) + tail
    blk = int(np.prod(slab))

    def local_mult(coef, xl):
        coef = coef[0]                          # (K, nzl, ...)
        v = xl.reshape(-1)[:blk].reshape(slab)
        if s > 0:
            top = v[nzl - s:]
            bot = v[:s]
            # planes from prev shard (their top) and next shard (their
            # bottom); edges receive zeros (ppermute semantics) — exactly
            # the no-neighbor boundary condition
            halo_prev = lax.ppermute(top, axis,
                                     [(i, i + 1) for i in range(Pn - 1)])
            halo_next = lax.ppermute(bot, axis,
                                     [(i + 1, i) for i in range(Pn - 1)])
            ext = jnp.concatenate([halo_prev, v, halo_next], axis=0)
        else:
            ext = v
        pads = ((0, 0),) + tuple(zip(lpad, rpad))
        extp = jnp.pad(ext, pads)
        acc = jnp.zeros(slab, dtype=v.dtype)
        for k, off in enumerate(offs):
            start = (s + off[0],) + tuple(lpad[ax - 1] + off[ax]
                                          for ax in range(1, nd))
            acc = acc + coef[k] * lax.dynamic_slice(extp, start, slab)
        return acc.reshape(1, blk)

    smap = shard_map(
        local_mult, mesh=mesh,
        in_specs=(P(axis, *([None] * (nd + 1))), P(axis)),
        out_specs=P(axis, None),
    )

    def mult(x):
        return smap(data["coef"], x).reshape(-1)

    def local_mult_t(coef, xl):
        # transpose stencil: contributions scatter to row+offset positions;
        # boundary z-planes landing outside the slab are ppermuted to the
        # owning neighbor and added (reverse of the bcast halo exchange)
        coef = coef[0]
        v = xl.reshape(-1)[:blk].reshape(slab)
        Pz = nzl + 2 * s
        Ptail = tuple(tail[ax] + lpad[ax] + rpad[ax]
                      for ax in range(len(tail)))
        acc = jnp.zeros((Pz,) + Ptail, dtype=v.dtype)
        for k, off in enumerate(offs):
            start = (s + off[0],) + tuple(lpad[ax - 1] + off[ax]
                                          for ax in range(1, nd))
            seg = lax.dynamic_slice(acc, start, slab)
            acc = lax.dynamic_update_slice(acc, seg + coef[k] * v, start)
        sl = (slice(None),) + tuple(slice(lpad[i], lpad[i] + tail[i])
                                    for i in range(len(tail)))
        acc = acc[sl]
        core = acc[s:nzl + s]
        if s > 0:
            low = acc[:s]              # rows owned by the previous shard
            high = acc[nzl + s:]       # rows owned by the next shard
            from_next = lax.ppermute(low, axis,
                                     [(i + 1, i) for i in range(Pn - 1)])
            from_prev = lax.ppermute(high, axis,
                                     [(i, i + 1) for i in range(Pn - 1)])
            core = core.at[nzl - s:].add(from_next)
            core = core.at[:s].add(from_prev)
        return core.reshape(1, blk)

    smap_t = shard_map(
        local_mult_t, mesh=mesh,
        in_specs=(P(axis, *([None] * (nd + 1))), P(axis)),
        out_specs=P(axis, None),
    )

    def mult_t(x):
        return smap_t(data["coef"], x).reshape(-1)

    return operator.Op(mult=mult, mult_t=mult_t,
                       diag=lambda: data["diag"])


def _bind_mpiaij(meta, data):
    from jax import shard_map
    from ..parallel.sf import ExchangePlan
    _, Pn, blk, cb, Kd, Ko, H, sf_meta, axis, mesh = meta[:10]
    Sd, So = (meta[10], meta[11]) if len(meta) > 10 else (0, 0)
    sp = data.get("sp", {})

    # PETSC_TPU_HALO_SEQUENTIAL=1 forces the diag SpMV to wait on the halo
    # (optimization_barrier) — the measurement knob for verifying the
    # overlap claim below (examples/scaling.py records the delta)
    halo_seq = os.environ.get("PETSC_TPU_HALO_SEQUENTIAL", "0") == "1"

    def local_mult(dd, di, od, oi, sp, sf, xl):
        dd, di, od, oi, xl = dd[0], di[0], od[0], oi[0], xl.reshape(-1)
        # overlap structure of MatMult_MPIAIJ (mpiaij.c:1052-1065): the
        # halo exchange (neighbor ppermutes) and the diag-block SpMV are
        # independent — XLA schedules them concurrently
        halo = ExchangePlan.bcast(sf_meta, sf, xl, axis)
        if halo_seq:
            xl, halo = jax.lax.optimization_barrier((xl, halo))
        y = spmv.ell_spmv(dd, di, xl) + spmv.ell_spmv(od, oi, halo)
        if Sd:  # long-row tails beyond the ELL lane cap (hybrid layout)
            y = y + spmv.csr_seg_spmv(sp["dsr"][0], sp["dsc"][0],
                                      sp["dsv"][0], xl, blk)
        if So:
            y = y + spmv.csr_seg_spmv(sp["osr"][0], sp["osc"][0],
                                      sp["osv"][0], halo, blk)
        return y.reshape(1, blk)

    sf_specs = {k: P(axis, None) for k in data["sf"]}
    sp_specs = {k: P(axis, None) for k in sp}
    smap = shard_map(
        local_mult, mesh=mesh,
        in_specs=(P(axis, None, None),) * 4 + (sp_specs, sf_specs, P(axis)),
        out_specs=P(axis, None),
    )

    def mult(x):
        y = smap(data["dd"], data["di"], data["od"], data["oi"],
                 sp, data["sf"], x)
        return y.reshape(-1)

    def local_mult_t(dd, di, od, oi, sp, sf, xl):
        # y = A^T x per shard: diag-block transpose is local; offdiag-block
        # transpose produces halo-position contributions that reduce-add
        # back to their owners (MatMultTranspose_MPIAIJ, mpiaij.c — the
        # reverse VecScatter path)
        dd, di, od, oi, xl = dd[0], di[0], od[0], oi[0], xl.reshape(-1)
        yd = spmv.ell_spmv_t(dd, di, xl, cb)
        contrib = spmv.ell_spmv_t(od, oi, xl, H)       # halo positions
        if Sd:
            yd = yd + spmv.csr_seg_spmv_t(sp["dsr"][0], sp["dsc"][0],
                                          sp["dsv"][0], xl, cb)
        if So:
            contrib = contrib + spmv.csr_seg_spmv_t(
                sp["osr"][0], sp["osc"][0], sp["osv"][0], xl, H)
        back = ExchangePlan.reduce_add(sf_meta, sf, contrib, cb, axis)
        return (yd + back).reshape(1, cb)

    smap_t = shard_map(
        local_mult_t, mesh=mesh,
        in_specs=(P(axis, None, None),) * 4 + (sp_specs, sf_specs, P(axis)),
        out_specs=P(axis, None),
    )

    def mult_t(x):
        y = smap_t(data["dd"], data["di"], data["od"], data["oi"],
                   sp, data["sf"], x)
        return y.reshape(-1)

    return operator.Op(mult=mult, mult_t=mult_t, diag=lambda: data["diag"])


def _bind_aij_perm(meta, data):
    """RCM-permuted operator: A = P^T A' P with A' in a gather-free
    layout (dia/hyb/bdia). The two O(n) permutation gathers cost ~2/K
    of the per-nnz gather they replace (MatOrdering genrcm.c role,
    wired into the layout auto-policy — r4 VERDICT item 3)."""
    _, im, m, inpad, npad = meta

    def _wrap(apply):
        if apply is None:
            return None

        def f(x):
            xp = x[data["perm"]]
            if inpad > m:
                xp = jnp.pad(xp, (0, inpad - m))
            y = apply(xp)[:m]
            return jnp.zeros((npad,), x.dtype).at[data["perm"]].set(y)
        return f

    op = operator.bind(im, data["inner"])
    diag = None
    if op.diag is not None:
        def diag(op=op):
            d = op.diag()[:m]
            return jnp.zeros((npad,), d.dtype).at[data["perm"]].set(d)
    return operator.Op(mult=_wrap(op.mult), mult_t=_wrap(op.mult_t),
                      diag=diag)


operator.register_binder("aij_perm", _bind_aij_perm)
operator.register_binder("aij_ell", _bind_aij_ell)
operator.register_binder("aij_dia", _bind_aij_dia)
operator.register_binder("aij_hyb", _bind_aij_hyb)
operator.register_binder("aij_bdia", _bind_aij_bdia)
operator.register_binder("aij_bell", _bind_aij_bell)
operator.register_binder("aij_dndb", _bind_aij_dndb)
operator.register_binder("aij_dnd", _bind_aij_dnd)
operator.register_binder("aij_csr", _bind_aij_csr)
operator.register_binder("mpiaij", _bind_mpiaij)
operator.register_binder("dnd_mpi", _bind_dnd_mpi)
