"""Supernodal sparse LU without pivoting: numeric engine + factor object.

TPU-era re-design of the reference LU line (LU/Source/SparseFrame.c):
- symbolic analysis runs on the pattern of A + A^T (ref CPCT builder
  :2254-2396) so L and U^T share one supernode structure;
- each supernode stores an L panel and a U^T panel with identical row
  patterns (ref side-by-side L|U storage, :1786-1797, slda = 2*nsrow-nscol);
- panel factorization is strictly unpivoted getrf (ref magma_dgetrf_nopiv
  :2653 / cusolverDnDgetrf with NULL ipiv :3344), which is exactly what makes
  the fully static TPU schedule possible;
- descendant updates are GEMM pairs C_L = Ld·Ud, C_U = Ud^T·Ld^T
  (ref U8 :2569-2604).

Like the reference, numerical stability relies on the matrix being
factorizable without pivoting (diagonally dominant / pre-equilibrated);
the residual gate plus f64 iterative refinement covers the rest.
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


class LUFactor:
    """Factorized P A P^T = L U (unit-diagonal L, no pivoting)."""

    def __init__(self, A: sp.spmatrix, sym: Symbolic, plan: FactorPlan,
                 Lx: jax.Array, Ux: jax.Array, config: Config, solver=None,
                 row_perm: np.ndarray | None = None):
        self.A = sp.csc_matrix(A)
        self.sym = sym
        self.plan = plan
        self.Lx = Lx
        self.Ux = Ux
        self.config = config
        self._solver = solver
        # static pivot row permutation (Config.static_pivot): the factor is
        # of B = A[row_perm], so solves permute b on the way in; A is kept
        # unpermuted so refinement/validation run against the user's matrix.
        self.row_perm = row_perm
        self._inperm = sym.perm if row_perm is None else row_perm[sym.perm]

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
        from spfx.symbolic import _native
        if getattr(self, "_Lh", None) is None:
            self._Lh = np.ascontiguousarray(np.asarray(self.Lx))
            self._Uh = np.ascontiguousarray(np.asarray(self.Ux))
        n = self.sym.n
        squeeze = b.ndim == 1
        b2 = np.asarray(b, dtype=np.float64).reshape(n, -1)
        out = np.empty_like(b2)
        for j in range(b2.shape[1]):
            x = np.ascontiguousarray(b2[self._inperm, j])
            _native.lu_solve_host(self.sym, self.plan, self._Lh, self._Uh, x)
            out[self.sym.perm, j] = x
        return out[:, 0] if squeeze else out

    def _solve_device(self, b: np.ndarray) -> np.ndarray:
        n = self.sym.n
        squeeze = b.ndim == 1
        b2 = b.reshape(n, -1)
        dtype = self.Lx.dtype
        xp = np.zeros((n + 1, b2.shape[1]), dtype=dtype)
        xp[:n] = b2[self._inperm]
        x = jnp.asarray(xp)
        engine = "fused" if self.config.fused else self.config.engine
        with jax.default_matmul_precision(self.config.matmul_precision):
            if engine == "mega":
                if self._solver is None:
                    from spfx.kernels.mega import MegaSolver
                    self._solver = MegaSolver(self.plan, lu=True,
                                              config=self.config)
                x = self._solver.forward(self.Lx, x)
                x = self._solver.backward(self.Ux, x)
            elif engine == "fused":
                if self._solver is None:
                    from spfx.kernels.fused import FusedSolver
                    self._solver = FusedSolver(
                        self.plan, lu=True,
                        calls_per_chunk=self.config.calls_per_chunk)
                x = self._solver.forward(self.Lx, x)
                x = self._solver.backward(self.Ux, x)
            else:
                from spfx.plan.schedule import PanelBucketC
                for lp in self.plan.levels:
                    for pb in lp.panels:
                        if isinstance(pb, PanelBucketC):
                            x = blocks.solve_fwd_level_c(
                                self.Lx, x, *pb.dev(), cp=pb.cp, rbp=pb.rbp,
                                lu=True)
                        else:
                            x = blocks.solve_fwd_level_lu(self.Lx, x,
                                                          *pb.dev())
                for lp in reversed(self.plan.levels):
                    for pb in lp.panels:
                        if isinstance(pb, PanelBucketC):
                            x = blocks.solve_bwd_level_c(
                                self.Ux, x, *pb.dev(), cp=pb.cp, rbp=pb.rbp,
                                lu=True)
                        else:
                            x = blocks.solve_bwd_level_lu(self.Ux, x,
                                                          *pb.dev())
        xh = np.asarray(x[:n])
        out = np.empty_like(xh)
        out[self.sym.perm] = xh
        return out[:, 0] if squeeze else out

    def solve(self, b: np.ndarray, refine: int | None = None) -> np.ndarray:
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

    def LU_sparse(self) -> tuple[sp.csc_matrix, sp.csc_matrix]:
        """Reconstruct (L, U) of P A P^T as scipy matrices — test path."""
        sym = self.sym
        Lh = np.asarray(self.Lx)
        Uh = np.asarray(self.Ux)
        lr, lc, lv = [], [], []
        ur, uc, uv = [], [], []
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
                pos = off + sr * wp + c                # row-major panel
                colv = Lh[pos]
                keep = rr >= c1 + c
                lr.append(rr[keep]); lc.append(np.full(keep.sum(), c1 + c))
                lv.append(colv[keep])
                # U^T panel column c holds U[c1+c, rr] for rr >= c1+c
                colu = Uh[pos]
                ur.append(np.full(keep.sum(), c1 + c)); uc.append(rr[keep])
                uv.append(colu[keep])
        n = sym.n
        L = sp.csc_matrix((np.concatenate(lv),
                           (np.concatenate(lr), np.concatenate(lc))),
                          shape=(n, n))
        U = sp.csc_matrix((np.concatenate(uv),
                           (np.concatenate(ur), np.concatenate(uc))),
                          shape=(n, n))
        return L, U


class LU:
    """Reusable symbolic+plan context for same-pattern unsymmetric systems."""

    def __init__(self, A: sp.spmatrix, config: Config = DEFAULT,
                 sym: Symbolic | None = None):
        A = sp.csc_matrix(A)
        self.config = config
        t0 = time.perf_counter()
        if config.static_pivot:
            from spfx.lu.pivot import static_pivot
            self.row_perm = static_pivot(A)
            A = sp.csc_matrix(A[self.row_perm])
        else:
            self.row_perm = None
        self.sym = sym if sym is not None else analyze(A, config,
                                                       symmetrize=True)
        self.analyze_time = time.perf_counter() - t0
        t0 = time.perf_counter()
        self.plan = build_plan(self.sym, A, config, lu=True)
        self.plan_time = time.perf_counter() - t0
        self._runner = None
        self._solver = None
        self._asm_idx = None

    def entry_values(self, A: sp.spmatrix, permute_rows: bool = True) -> tuple:
        """Permuted L-lower and U^T entry values (the per-factorize
        host->device payload)."""
        A = sp.csc_matrix(A)
        if permute_rows and self.row_perm is not None:
            A = sp.csc_matrix(A[self.row_perm])
        dtype = jnp.dtype(self.config.dtype)
        Ap = A[self.sym.perm][:, self.sym.perm]
        low = sp.tril(Ap).tocsc()
        upt = sp.tril(Ap.T, -1).tocsc()
        return (jnp.asarray(low.data.astype(dtype)),
                jnp.asarray(upt.data.astype(dtype)))

    def factorize(self, A: sp.spmatrix) -> LUFactor:
        from spfx.utils.instrument import finish_factorize, profile_scope
        A = sp.csc_matrix(A)
        Araw = A
        t0 = time.perf_counter()
        if self.row_perm is not None:
            A = sp.csc_matrix(A[self.row_perm])
        vals_l, vals_u = self.entry_values(A, permute_rows=False)
        engine = "fused" if self.config.fused else self.config.engine
        if engine == "mega":
            # whole schedule (assembly included) = ONE dispatch
            if self._runner is None:
                from spfx.kernels.mega import MegaRunner
                self._runner = MegaRunner(self.plan, lu=True,
                                          config=self.config)
            with profile_scope(self.config, "factorize"):
                Lx, Ux = self._runner.run(vals_l, vals_u)
            f = LUFactor(Araw, self.sym, self.plan, Lx, Ux, self.config,
                         solver=self._solver, row_perm=self.row_perm)
            return finish_factorize(self, f, t0, Lx)
        if self._asm_idx is None:
            self._asm_idx = (
                jnp.asarray(self.plan.assembly_idx.astype(np.int32)),
                jnp.asarray(self.plan.assembly_idx_u.astype(np.int32)))
        Lx = blocks.assemble(self._asm_idx[0], vals_l, self.plan.storage)
        Ux = blocks.assemble(self._asm_idx[1], vals_u, self.plan.storage)
        with jax.default_matmul_precision(self.config.matmul_precision):
            if engine == "fused":
                if self._runner is None:
                    from spfx.kernels.fused import FusedRunner, FusedSolver
                    self._runner = FusedRunner(
                        self.plan, lu=True,
                        calls_per_chunk=self.config.calls_per_chunk)
                    self._solver = FusedSolver(
                        self.plan, lu=True,
                        calls_per_chunk=self.config.calls_per_chunk)
                Lx, Ux = self._runner.run(Lx, Ux)
            else:
                from spfx.plan.schedule import PanelBucketC, UpdateBucketC
                upd_prec = self.config.update_precision \
                    or self.config.matmul_precision
                for lp in self.plan.levels:
                    with jax.default_matmul_precision(upd_prec):
                        for ub in lp.updates:
                            if isinstance(ub, UpdateBucketC) \
                                    and ub.head_start is not None:
                                Lx, Ux = blocks.apply_updates_lu_t(
                                    Lx, Ux, *ub.dev(), mp=ub.mp, kp=ub.kp,
                                    csp=ub.csp, srows=ub.slab_rows)
                            elif isinstance(ub, UpdateBucketC):
                                Lx, Ux = blocks.apply_updates_lu_c(
                                    Lx, Ux, *ub.dev(), mp=ub.mp, kp=ub.kp,
                                    csp=ub.csp, srows=ub.slab_rows)
                            else:
                                Lx, Ux = blocks.apply_updates_lu(
                                    Lx, Ux, *ub.dev(), kp=ub.kp, csp=ub.csp)
                    for pb in lp.panels:
                        if isinstance(pb, PanelBucketC):
                            Lx, Ux = blocks.factor_panels_lu_uj(
                                Lx, Ux, *pb.dev_u(), cp=pb.cp, rbp=pb.rbp)
                        else:
                            d = pb.dev()
                            Lx, Ux = blocks.factor_panels_lu(Lx, Ux, d[0],
                                                             d[1], d[2])
        f = LUFactor(Araw, self.sym, self.plan, Lx, Ux, self.config,
                     solver=self._solver, row_perm=self.row_perm)
        return finish_factorize(self, f, t0, Lx)


def lu(A: sp.spmatrix, config: Config = DEFAULT) -> LUFactor:
    """One-shot: analyze + plan + unpivoted numeric LU of A."""
    return LU(A, config).factorize(A)
