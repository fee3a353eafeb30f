"""Supernodal sparse Cholesky: numeric engine + factor object.

TPU-era re-design of the reference numeric layer
(SparseFrame_factorize_supernodal, Cholesky/Source/SparseFrame.c:2150-3017):
the dynamic OpenMP worker pool over a leaf queue becomes a static schedule of
batched XLA kernels. The default engine ("mega", spfx.kernels.mega) compiles
the WHOLE schedule — device-side assembly scatter (ref loadA :1998-2028,
values-only host->device transfer, cached index map) plus every level's
update and panel buckets — into one jitted lax.scan, i.e. exactly one
dispatch per factorization; engine="calls" runs one donated jit call per
bucket instead.
"""

from __future__ import annotations

import time

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from spfx.kernels import blocks
from spfx.plan.schedule import FactorPlan, build_plan
from spfx.symbolic.analyze import Symbolic, analyze
from spfx.utils.config import Config, DEFAULT


class CholeskyFactor:
    """Factorized P A P^T = L L^T with batched supernodal solve.

    The factor lives on device as one flat panel array (plus sentinels);
    ``solve`` runs the level-batched triangular solves on device and applies
    f64 iterative refinement on the host (the TPU computes in f32; refinement
    recovers reference (double) residual quality — this replaces the
    reference's all-double arithmetic, which TPUs do not execute natively).
    """

    def __init__(self, A: sp.spmatrix, sym: Symbolic, plan: FactorPlan,
                 L: jax.Array, config: Config, solver=None):
        self.A = sp.csc_matrix(A)
        self.sym = sym
        self.plan = plan
        self.L = L
        self.config = config
        self._solver = solver          # shared FusedSolver from the context

    # -- solves -----------------------------------------------------------

    def _use_host_solve(self) -> bool:
        from spfx.symbolic import _native
        if self.config.solve_backend == "device":
            return False
        if "complex" in self.config.dtype:
            return False
        ok = _native.available()
        if self.config.solve_backend == "host" and not ok:
            raise RuntimeError("host solve requested but native lib missing")
        return ok

    def _solve_host(self, b: np.ndarray) -> np.ndarray:
        """Native C++ supernodal solve on the copied-back factor (f64)."""
        from spfx.symbolic import _native
        if not hasattr(self, "_Lh") or self._Lh is None:
            self._Lh = np.ascontiguousarray(np.asarray(self.L))
        n = self.sym.n
        squeeze = b.ndim == 1
        b2 = np.asarray(b, dtype=np.float64).reshape(n, -1)
        out = np.empty_like(b2)
        for j in range(b2.shape[1]):
            x = np.ascontiguousarray(b2[self.sym.perm, j])
            _native.chol_solve_host(self.sym, self.plan, self._Lh, x)
            out[self.sym.perm, j] = x
        return out[:, 0] if squeeze else out

    def _solve_device(self, b: np.ndarray) -> np.ndarray:
        """One forward+backward supernodal solve pass on device."""
        n = self.sym.n
        squeeze = b.ndim == 1
        b2 = b.reshape(n, -1)
        dtype = self.L.dtype
        xp = np.zeros((n + 1, b2.shape[1]), dtype=dtype)
        xp[:n] = b2[self.sym.perm]
        x = jnp.asarray(xp)
        engine = "fused" if self.config.fused else self.config.engine
        with jax.default_matmul_precision(self.config.matmul_precision):
            if engine == "mega":
                if self._solver is None:
                    from spfx.kernels.mega import MegaSolver
                    self._solver = MegaSolver(self.plan, lu=False,
                                              config=self.config)
                x = self._solver.forward(self.L, x)
                x = self._solver.backward(self.L, x)
            elif engine == "fused":
                if self._solver is None:
                    from spfx.kernels.fused import FusedSolver
                    self._solver = FusedSolver(
                        self.plan, lu=False,
                        calls_per_chunk=self.config.calls_per_chunk)
                x = self._solver.forward(self.L, x)
                x = self._solver.backward(self.L, x)
            else:
                from spfx.plan.schedule import PanelBucketC
                for lp in self.plan.levels:
                    for pb in lp.panels:
                        if isinstance(pb, PanelBucketC):
                            x = blocks.solve_fwd_level_c(
                                self.L, x, *pb.dev(), cp=pb.cp, rbp=pb.rbp)
                        else:
                            x = blocks.solve_fwd_level(self.L, x, *pb.dev())
                for lp in reversed(self.plan.levels):
                    for pb in lp.panels:
                        if isinstance(pb, PanelBucketC):
                            x = blocks.solve_bwd_level_c(
                                self.L, x, *pb.dev(), cp=pb.cp, rbp=pb.rbp)
                        else:
                            x = blocks.solve_bwd_level(self.L, x, *pb.dev())
        xh = np.asarray(x[:n])
        out = np.empty_like(xh)
        out[self.sym.perm] = xh
        return out[:, 0] if squeeze else out

    def solve(self, b: np.ndarray, refine: int | None = None) -> np.ndarray:
        """Solve A x = b with f64 iterative refinement (mixed precision)."""
        refine = self.config.refine_iters if refine is None else refine
        b = np.asarray(b)
        wide = np.complex128 if (np.iscomplexobj(b)
                                 or "complex" in self.config.dtype) \
            else np.float64
        b = b.astype(wide)
        solve1 = self._solve_host if self._use_host_solve() \
            else self._solve_device
        x = solve1(b).astype(wide)
        if refine <= 0:
            return x
        bn = np.abs(b).max() + 1e-300
        for _ in range(refine):
            r = b - self.A @ x
            if np.abs(r).max() / bn < self.config.refine_tol:
                break
            x = x + solve1(r).astype(wide)
        return x

    # -- introspection ----------------------------------------------------

    def L_sparse(self) -> sp.csc_matrix:
        """Reconstruct L (of P A P^T) as scipy CSC — test/debug path."""
        sym = self.sym
        Lh = np.asarray(self.L)
        rows, cols, vals = [], [], []
        shift = self.plan.below_shift
        for s in range(sym.nsuper):
            c1, c2 = sym.sn_start[s], sym.sn_start[s + 1]
            rr = sym.sn_row_list(s)
            R = len(rr)
            w = c2 - c1
            wp = int(self.plan.strides[s])
            off = self.plan.offsets[s]
            sr = np.arange(R)
            if shift is not None:
                sr = sr + np.where(sr >= w, shift[s], 0)
            for c in range(w):
                v = Lh[off + sr * wp + c]              # row-major panel
                keep = rr >= c1 + c
                rows.append(rr[keep])
                cols.append(np.full(keep.sum(), c1 + c))
                vals.append(v[keep])
        return sp.csc_matrix(
            (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
            shape=(sym.n, sym.n))

    def logdet(self) -> float:
        """log det(A) = 2 * sum(log diag(L)) — uses valid diagonal slots."""
        sym = self.sym
        Lh = np.asarray(self.L, dtype=np.float64)
        tot = 0.0
        for s in range(sym.nsuper):
            c1, c2 = sym.sn_start[s], sym.sn_start[s + 1]
            w = c2 - c1
            wp = int(self.plan.strides[s])
            off = self.plan.offsets[s]
            d = Lh[off + np.arange(w) * wp + np.arange(w)]  # panel diagonal
            tot += np.log(d).sum()
        return 2.0 * tot


class Cholesky:
    """Reusable symbolic+plan context: factorize many same-pattern matrices."""

    def __init__(self, A: sp.spmatrix, config: Config = DEFAULT,
                 sym: Symbolic | None = None):
        A = sp.csc_matrix(A)
        self.config = config
        t0 = time.perf_counter()
        self.sym = sym if sym is not None else analyze(A, config)
        self.analyze_time = time.perf_counter() - t0
        t0 = time.perf_counter()
        self.plan = build_plan(self.sym, A, config)
        self.plan_time = time.perf_counter() - t0
        self._runner = None
        self._solver = None
        self._asm_idx = None

    def entry_values(self, A: sp.spmatrix) -> tuple:
        """Permuted lower-triangle entry values — the only data that crosses
        the host->device link per factorization (assembly index maps are
        plan constants cached on device)."""
        dtype = jnp.dtype(self.config.dtype)
        Ap = sp.csc_matrix(A)[self.sym.perm][:, self.sym.perm]
        low = sp.tril(Ap).tocsc()
        return (jnp.asarray(low.data.astype(dtype)),)

    def factorize(self, A: sp.spmatrix) -> CholeskyFactor:
        from spfx.utils.instrument import finish_factorize, profile_scope
        A = sp.csc_matrix(A)
        t0 = time.perf_counter()
        # assembly (ref loadA): permute, take lower, scatter into flat panels
        # on device — only the nnz values cross the host->device link
        (vals,) = self.entry_values(A)
        engine = "fused" if self.config.fused else self.config.engine
        if engine == "mega":
            # whole schedule (assembly included) = ONE dispatch
            if self._runner is None:
                from spfx.kernels.mega import MegaRunner
                self._runner = MegaRunner(self.plan, lu=False,
                                          config=self.config)
            with profile_scope(self.config, "factorize"):
                L = self._runner.run(vals)
            f = CholeskyFactor(A, self.sym, self.plan, L, self.config,
                               solver=self._solver)
            return finish_factorize(self, f, t0, L)
        if self._asm_idx is None:
            self._asm_idx = jnp.asarray(
                self.plan.assembly_idx.astype(np.int32))
        L = blocks.assemble(self._asm_idx, vals, self.plan.storage)
        with jax.default_matmul_precision(self.config.matmul_precision):
            if engine == "fused":
                if self._runner is None:
                    from spfx.kernels.fused import FusedRunner, FusedSolver
                    self._runner = FusedRunner(
                        self.plan, lu=False,
                        calls_per_chunk=self.config.calls_per_chunk)
                    self._solver = FusedSolver(
                        self.plan, lu=False,
                        calls_per_chunk=self.config.calls_per_chunk)
                L = self._runner.run(L)
            else:
                from spfx.plan.schedule import PanelBucketC, UpdateBucketC
                upd_prec = self.config.update_precision \
                    or self.config.matmul_precision
                for lp in self.plan.levels:
                    # left-looking: drain this level's pending updates, then
                    # factor its panels
                    with jax.default_matmul_precision(upd_prec):
                        for ub in lp.updates:
                            if isinstance(ub, UpdateBucketC) \
                                    and ub.head_start is not None:
                                L = blocks.apply_updates_sym_t(
                                    L, *ub.dev(), mp=ub.mp, kp=ub.kp,
                                    csp=ub.csp, srows=ub.slab_rows)
                            elif isinstance(ub, UpdateBucketC):
                                L = blocks.apply_updates_sym_c(
                                    L, *ub.dev(), mp=ub.mp, kp=ub.kp,
                                    csp=ub.csp, srows=ub.slab_rows)
                            else:
                                L = blocks.apply_updates_sym(L, *ub.dev(),
                                                             kp=ub.kp,
                                                             csp=ub.csp)
                    for pb in lp.panels:
                        if isinstance(pb, PanelBucketC):
                            L = blocks.factor_panels_chol_uj(
                                L, *pb.dev_u(), cp=pb.cp, rbp=pb.rbp)
                        else:
                            d = pb.dev()
                            L = blocks.factor_panels_chol(L, d[0], d[1],
                                                          d[2])
        f = CholeskyFactor(A, self.sym, self.plan, L, self.config,
                           solver=self._solver)
        return finish_factorize(self, f, t0, L)


def cholesky(A: sp.spmatrix, config: Config = DEFAULT) -> CholeskyFactor:
    """One-shot: analyze + plan + numeric factorization of SPD A."""
    return Cholesky(A, config).factorize(A)
