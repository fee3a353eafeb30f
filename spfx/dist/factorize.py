"""Multi-chip sharded supernodal factorization (shard_map over a 1-D mesh).

TPU-native equivalent of the reference's multi-GPU work sharing over
supernodes (SURVEY.md §2e P3/P4: one OpenMP worker per GPU handler pulling
supernodes off a shared leaf queue, factored panels cached per device and
staged over PCIe — Cholesky/Source/SparseFrame.c:2267-2467).

spfx's static level schedule makes the distributed version declarative:
every bucket's batch dimension is sharded across the mesh axis, so each chip
computes the update/panel math for its slice of a level's tasks against a
replicated factor array. Per phase, chips scatter their row deltas into a
local zero buffer and ONE ``psum`` merges them (XLA lowers it to an ICI
all-reduce) — replacing the reference's pinned-host staging + cudaMemcpyAsync
traffic and its atomicAdd scatter kernel (cuda_kernel.cu:101-108): the psum
is the deterministic, conflict-free version of concurrent GPUs subtracting
into one frontal matrix.

Two all-reduces of the factor array per level is bandwidth-heavy relative to
single-chip arithmetic at small n; it is the straightforward work-sharing
layout (the reference's own multi-GPU mode pays the analogous PCIe cost).
Subtree decomposition (chips own disjoint elimination subtrees, exchange only
above the separator levels) is the planned lower-communication refinement.
"""

from __future__ import annotations

import time

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spfx.chol.factorize import CholeskyFactor
from spfx.lu.factorize import LUFactor
from spfx.dist.mesh import make_mesh
from spfx.kernels import blocks
from spfx.kernels.fused import chunk_levels
from spfx.plan.schedule import build_plan
from spfx.symbolic.analyze import analyze
from spfx.utils.config import Config, DEFAULT


def _pad_dim0(a: np.ndarray, mult: int, fill) -> np.ndarray:
    """Pad dim 0 to a multiple of ``mult`` with ``fill`` (inert tasks)."""
    b = a.shape[0]
    rem = (-b) % mult
    if rem == 0:
        return a
    pad = np.full((rem,) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, pad])


def _chol_chunk_fn(spec, axis):
    """spec: per-level tuples (update_entries, panel_entries); entries are
    ('U', kp, csp) / ('UC', mp, kp, csp) and ('P',) / ('PC', cp, rbp)."""

    def fn(L, *arrays):
        it = iter(arrays)
        for level in spec:
            upds, panels = level
            if upds:
                delta = jnp.zeros_like(L)
                for ent in upds:
                    if ent[0] == "UT":
                        _, mp, kp, csp = ent
                        kw, mr, rs, ss, hs, tgt, cpos = \
                            (next(it) for _ in range(7))
                        E = blocks.update_rows_sym_t(L, kw, mr, rs, ss, hs,
                                                     cpos, mp, kp, csp)
                    elif ent[0] == "UC":
                        _, mp, kp, csp = ent
                        kw, mr, ss, tgt, cpos = (next(it) for _ in range(5))
                        E = blocks.update_rows_sym_c(L, kw, mr, ss, cpos,
                                                     mp, kp, csp)
                    else:
                        _, kp, csp = ent
                        kw, src, tgt, cpos = (next(it) for _ in range(4))
                        E = blocks.update_rows_sym(L, kw, src, cpos, kp, csp)
                    delta = blocks._win_scatter_add(delta, tgt, -E)
                L = L + lax.psum(delta, axis)
            if panels:
                delta = jnp.zeros_like(L)
                for ent in panels:
                    if ent[0] == "PC":
                        _, cp, rbp = ent
                        w, nb, ds, bs = (next(it) for _ in range(4))
                        dD, dB = blocks.panel_deltas_chol_c(L, w, nb, ds, bs,
                                                            cp, rbp)
                        delta = blocks._task_scatter_add(delta, ds, dD)
                        if rbp:
                            delta = blocks._task_scatter_add(delta, bs, dB)
                    else:
                        w, diag, below = (next(it) for _ in range(3))
                        dD, dB = blocks.panel_deltas_chol(L, w, diag, below)
                        delta = blocks._win_scatter_add(delta, diag, dD)
                        delta = blocks._win_scatter_add(delta, below, dB)
                L = L + lax.psum(delta, axis)
        return L

    return fn


def _lu_chunk_fn(spec, axis):
    def fn(Lx, Ux, *arrays):
        it = iter(arrays)
        for level in spec:
            upds, panels = level
            if upds:
                dL = jnp.zeros_like(Lx)
                dU = jnp.zeros_like(Ux)
                for ent in upds:
                    if ent[0] == "UT":
                        _, mp, kp, csp = ent
                        kw, mr, rs, ss, hs, tgt, cpos = \
                            (next(it) for _ in range(7))
                        EL, EU = blocks.update_rows_lu_t(
                            Lx, Ux, kw, mr, rs, ss, hs, cpos, mp, kp, csp)
                    elif ent[0] == "UC":
                        _, mp, kp, csp = ent
                        kw, mr, ss, tgt, cpos = (next(it) for _ in range(5))
                        EL, EU = blocks.update_rows_lu_c(
                            Lx, Ux, kw, mr, ss, cpos, mp, kp, csp)
                    else:
                        _, kp, csp = ent
                        kw, src, tgt, cpos = (next(it) for _ in range(4))
                        EL, EU = blocks.update_rows_lu(Lx, Ux, kw, src, cpos,
                                                       kp, csp)
                    dL = blocks._win_scatter_add(dL, tgt, -EL)
                    dU = blocks._win_scatter_add(dU, tgt, -EU)
                Lx = Lx + lax.psum(dL, axis)
                Ux = Ux + lax.psum(dU, axis)
            if panels:
                dL = jnp.zeros_like(Lx)
                dU = jnp.zeros_like(Ux)
                for ent in panels:
                    if ent[0] == "PC":
                        _, cp, rbp = ent
                        w, nb, ds, bs = (next(it) for _ in range(4))
                        dDL, dBL, dDU, dBU = blocks.panel_deltas_lu_c(
                            Lx, Ux, w, nb, ds, bs, cp, rbp)
                        dL = blocks._task_scatter_add(dL, ds, dDL)
                        dU = blocks._task_scatter_add(dU, ds, dDU)
                        if rbp:
                            dL = blocks._task_scatter_add(dL, bs, dBL)
                            dU = blocks._task_scatter_add(dU, bs, dBU)
                    else:
                        w, diag, below = (next(it) for _ in range(3))
                        dDL, dBL, dDU, dBU = blocks.panel_deltas_lu(
                            Lx, Ux, w, diag, below)
                        dL = blocks._win_scatter_add(dL, diag, dDL)
                        dL = blocks._win_scatter_add(dL, below, dBL)
                        dU = blocks._win_scatter_add(dU, diag, dDU)
                        dU = blocks._win_scatter_add(dU, below, dBU)
                Lx = Lx + lax.psum(dL, axis)
                Ux = Ux + lax.psum(dU, axis)
        return Lx, Ux

    return fn


class _ShardedBase:
    """Shared machinery: build chunked shard_map programs over one plan."""

    lu = False

    def __init__(self, A: sp.spmatrix, config: Config = DEFAULT,
                 mesh: Mesh | None = None, axis: str | None = None,
                 sym=None):
        A = sp.csc_matrix(A)
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(axis or "d")
        self.axis = axis or self.mesh.axis_names[0]
        self.ndev = int(np.prod(self.mesh.devices.shape))
        t0 = time.perf_counter()
        self.sym = sym if sym is not None else analyze(
            A, config, symmetrize=self.lu)
        self.analyze_time = time.perf_counter() - t0
        t0 = time.perf_counter()
        self.plan = build_plan(self.sym, A, config, lu=self.lu)
        self.plan_time = time.perf_counter() - t0
        self._build_programs()

    def _build_programs(self):
        shd = NamedSharding(self.mesh, P(self.axis))
        nstate = 2 if self.lu else 1
        mk = _lu_chunk_fn if self.lu else _chol_chunk_fn
        self.chunks = []
        from spfx.plan.schedule import PanelBucketC, UpdateBucketC
        for levels in chunk_levels(self.plan.levels,
                                   self.config.calls_per_chunk):
            spec, args = [], []
            for lp in levels:
                upds, panels = [], []
                for ub in lp.updates:
                    if isinstance(ub, UpdateBucketC) \
                            and ub.head_start is not None:
                        upds.append(("UT", ub.mp, ub.kp, ub.csp))
                        arrs = (ub.kw, ub.mrows, ub.rstart, ub.src_start,
                                ub.head_start, ub.tgt_row_start,
                                ub.tgt_cpos)
                        fills = (0, 0, 0, -1, -1, -1, -1)
                    elif isinstance(ub, UpdateBucketC):
                        upds.append(("UC", ub.mp, ub.kp, ub.csp))
                        arrs = (ub.kw, ub.mrows, ub.src_start,
                                ub.tgt_row_start, ub.tgt_cpos)
                        fills = (0, 0, -1, -1, -1)
                    else:
                        upds.append(("U", ub.kp, ub.csp))
                        arrs = (ub.kw, ub.src_row_start, ub.tgt_row_start,
                                ub.tgt_cpos)
                        fills = (0, -1, -1, -1)
                    for a, f in zip(arrs, fills):
                        args.append(jax.device_put(
                            _pad_dim0(a, self.ndev, f), shd))
                for pb in lp.panels:
                    if isinstance(pb, PanelBucketC):
                        panels.append(("PC", pb.cp, pb.rbp))
                        arrs = (pb.widths, pb.nbelow, pb.diag_start,
                                pb.below_start)
                        fills = (0, 0, -1, -1)
                    else:
                        panels.append(("P",))
                        arrs = (pb.widths, pb.diag_row_start,
                                pb.below_row_start)
                        fills = (0, -1, -1)
                    for a, f in zip(arrs, fills):
                        args.append(jax.device_put(
                            _pad_dim0(a, self.ndev, f), shd))
                spec.append((tuple(upds), tuple(panels)))
            in_specs = (P(),) * nstate + (P(self.axis),) * len(args)
            out_specs = P() if nstate == 1 else (P(), P())
            # check_vma=False: the panel branches route through pallas
            # kernels whose out_shape ShapeDtypeStructs carry no vma, which
            # current shard_map rejects under its default varying-axes
            # check (same setting as spfx.dist.subtree)
            fn = jax.jit(
                jax.shard_map(mk(tuple(spec), self.axis), mesh=self.mesh,
                              in_specs=in_specs, out_specs=out_specs,
                              check_vma=False),
                donate_argnums=tuple(range(nstate)))
            self.chunks.append((fn, args))

    def _run(self, *state):
        rep = NamedSharding(self.mesh, P())
        state = tuple(jax.device_put(s, rep) for s in state)
        with jax.default_matmul_precision(self.config.matmul_precision):
            for fn, args in self.chunks:
                state = fn(*state, *args)
                if not self.lu:
                    state = (state,)
        return state


class ShardedCholesky(_ShardedBase):
    """Cholesky context whose numeric factorization is sharded over a mesh.

    Usage mirrors ``spfx.chol.factorize.Cholesky``; the resulting
    ``CholeskyFactor`` is replicated across the mesh (its solve paths work
    unchanged)."""

    lu = False

    def factorize(self, A: sp.spmatrix) -> CholeskyFactor:
        A = sp.csc_matrix(A)
        dtype = jnp.dtype(self.config.dtype)
        # device-side assembly, same as the single-chip engines: only the
        # nnz values cross the host->device link
        Ap = A[self.sym.perm][:, self.sym.perm]
        low = sp.tril(Ap).tocsc()
        if getattr(self, "_asm", None) is None:
            self._asm = jnp.asarray(self.plan.assembly_idx.astype(np.int32))
        L0 = blocks.assemble(self._asm,
                             jnp.asarray(low.data.astype(dtype)),
                             self.plan.storage)
        (L,) = self._run(L0)
        return CholeskyFactor(A, self.sym, self.plan, L, self.config)


class ShardedLU(_ShardedBase):
    """LU (no-pivot) context sharded over a mesh; mirrors ``spfx.lu.LU``."""

    lu = True

    def factorize(self, A: sp.spmatrix) -> LUFactor:
        A = sp.csc_matrix(A)
        dtype = jnp.dtype(self.config.dtype)
        Ap = A[self.sym.perm][:, self.sym.perm]
        low = sp.tril(Ap).tocsc()
        upt = sp.tril(Ap.T, -1).tocsc()
        if getattr(self, "_asm", None) is None:
            self._asm = (
                jnp.asarray(self.plan.assembly_idx.astype(np.int32)),
                jnp.asarray(self.plan.assembly_idx_u.astype(np.int32)))
        L0 = blocks.assemble(self._asm[0],
                             jnp.asarray(low.data.astype(dtype)),
                             self.plan.storage)
        U0 = blocks.assemble(self._asm[1],
                             jnp.asarray(upt.data.astype(dtype)),
                             self.plan.storage)
        Lx, Ux = self._run(L0, U0)
        return LUFactor(A, self.sym, self.plan, Lx, Ux, self.config)
