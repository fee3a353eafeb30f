"""ALS / iALS matrix-factorization recommender on batched Cholesky solves.

Per BASELINE.json's north star: user/item embedding tables are row-sharded
across a device mesh; each half-iteration solves a batch of k x k regularized
normal equations with the batched Cholesky kernels (spfx.kernels.dense). A
sweep is ONE jitted shard_map program: every device updates its own row shard
(data parallelism over users/items) while the read-side table is passed in
replicated (XLA's all_gather over ICI materializes it), and the shared
Gramian G = Y^T Y is computed once per sweep as a sharded matmul (psum).

Implicit ALS (Hu-Koren-Volinsky): minimize
  sum_ui c_ui (p_ui - u_u . v_i)^2 + lam (|U|^2 + |V|^2),
  c_ui = 1 + alpha r_ui, p_ui = [r_ui > 0],
with the Gramian trick A_u = V^T V + V_u^T diag(c-1) V_u + lam I.
Explicit ALS: alternating ridge regression on observed entries.

All shapes static: interactions are degree-capped padded index arrays
(spfx.recsys.data.padded_rows); each device scans its shard in fixed-size
chunks (config.chunk rows per chunk per device).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from spfx.dist.mesh import make_mesh, round_up
from spfx.kernels.dense import batched_chol_solve
from .data import Interactions, padded_rows


@dataclasses.dataclass(frozen=True)
class ALSConfig:
    rank: int = 64
    lam: float = 0.1            # L2 regularization
    alpha: float = 10.0         # implicit confidence weight
    implicit: bool = True
    iters: int = 10
    user_cap: int = 256         # degree cap (padded row width), users
    item_cap: int = 512         # degree cap, items
    chunk: int = 1024           # rows per chunk per device
    dtype: str = "float32"
    matmul_precision: str = "highest"   # TPU f32 matmul passes (see Config)
    seed: int = 0


def _solve_rows(Yz, G, idx, rat, lam, alpha, implicit: bool):
    """Normal-equation solve for one chunk of rows.

    Yz: (m+1, k) read-side table with a zero sentinel row at index m
    G:  (k, k) shared Gramian Y^T Y (zero on the explicit path)
    idx/rat: (C, D) padded neighbor ids (-1 pad) and ratings (0 pad)
    """
    k = Yz.shape[1]
    m = Yz.shape[0] - 1
    gi = jnp.where(idx >= 0, idx, m)
    Yg = Yz[gi]                                    # (C, D, k)
    mask = (idx >= 0).astype(Yg.dtype)
    if implicit:
        cm1 = alpha * rat                          # c - 1; 0 on padding
        A = G[None] + jnp.einsum("cdk,cd,cdl->ckl", Yg, cm1, Yg,
                                 preferred_element_type=Yg.dtype)
        b = jnp.einsum("cdk,cd->ck", Yg, (1.0 + cm1) * mask,
                       preferred_element_type=Yg.dtype)
    else:
        A = jnp.einsum("cdk,cd,cdl->ckl", Yg, mask, Yg,
                       preferred_element_type=Yg.dtype)
        b = jnp.einsum("cdk,cd->ck", Yg, rat * mask,
                       preferred_element_type=Yg.dtype)
    A = A + lam * jnp.eye(k, dtype=Yg.dtype)[None]
    return batched_chol_solve(A, b[..., None])[..., 0]


def make_sweep(mesh: Mesh, implicit: bool, chunk: int):
    """Build the sharded sweep: (Yother, idx, rat, lam, alpha) -> Xnew.

    Each device scans its local row shard in ``chunk``-row chunks; Yother is
    consumed replicated (in_spec P() => all_gather of the row-sharded table).
    Returns (jitted sweep, raw traceable sweep) — the raw form composes into
    the multi-iteration fori_loop of make_fit_steps.
    """
    axis = mesh.axis_names[0]

    def local_sweep(idx_l, rat_l, Yz, G, lam, alpha):
        nloc = idx_l.shape[0]
        nch = max(1, nloc // chunk)
        idx_r = idx_l.reshape(nch, nloc // nch, -1)
        rat_r = rat_l.reshape(nch, nloc // nch, -1)

        def body(args):
            i_, r_ = args
            return _solve_rows(Yz, G, i_, r_, lam, alpha, implicit)

        out = jax.lax.map(body, (idx_r, rat_r))
        return out.reshape(nloc, -1)

    smapped = shard_map(
        local_sweep, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P(), P()),
        out_specs=P(axis))

    def sweep_raw(Yother, idx, rat, lam, alpha):
        k = Yother.shape[1]
        # Gramian over the full table: sharded matmul -> psum; padded and
        # sentinel rows are zero so they contribute nothing.
        if implicit:
            G = jnp.einsum("nk,nl->kl", Yother, Yother,
                           preferred_element_type=Yother.dtype)
        else:
            G = jnp.zeros((k, k), Yother.dtype)
        Yz = jnp.concatenate(
            [Yother, jnp.zeros((1, k), Yother.dtype)], axis=0)
        return smapped(idx, rat, Yz, G, lam, alpha)

    return jax.jit(sweep_raw), sweep_raw


def make_fit_steps(mesh: Mesh, implicit: bool, chunk: int):
    """Multi-iteration training as ONE jitted program: `iters` is a traced
    scalar, so any iteration count shares one compiled executable and a full
    fit costs one host->device dispatch (host/tunnel round trips measured
    55us..1.8s under contention)."""
    _, sweep_raw = make_sweep(mesh, implicit, chunk)

    @jax.jit
    def fit_steps(iters, U, V, u_idx, u_rat, i_idx, i_rat, lam, alpha):
        def body(_, UV):
            U, V = UV
            U = sweep_raw(V, u_idx, u_rat, lam, alpha)
            V = sweep_raw(U, i_idx, i_rat, lam, alpha)
            return (U, V)

        return jax.lax.fori_loop(0, iters, body, (U, V))

    return fit_steps


class ALSModel:
    """Row-sharded ALS/iALS model over a 1-D device mesh."""

    def __init__(self, data: Interactions, config: ALSConfig = ALSConfig(),
                 mesh: Mesh | None = None):
        self.config = config
        self.data = data
        self.mesh = mesh if mesh is not None else make_mesh()
        ndev = self.mesh.devices.size
        c = config
        dtype = jnp.dtype(c.dtype)
        # pad table sizes so shards and per-device chunks divide evenly
        self.nu = round_up(data.num_users, c.chunk * ndev)
        self.ni = round_up(data.num_items, c.chunk * ndev)
        self.u_idx, self.u_rat = padded_rows(
            data.user_ids, data.item_ids, data.ratings, data.num_users,
            c.user_cap, pad_rows_to=self.nu)
        self.i_idx, self.i_rat = padded_rows(
            data.item_ids, data.user_ids, data.ratings, data.num_items,
            c.item_cap, pad_rows_to=self.ni)
        rng = np.random.default_rng(c.seed)
        scale = 1.0 / np.sqrt(c.rank)
        U0 = (rng.standard_normal((self.nu, c.rank)) * scale).astype(dtype)
        V0 = (rng.standard_normal((self.ni, c.rank)) * scale).astype(dtype)
        U0[data.num_users:] = 0      # alignment-padding rows must stay zero
        V0[data.num_items:] = 0      # (they feed the shared Gramian)
        axis = self.mesh.axis_names[0]
        self.shard = NamedSharding(self.mesh, P(axis))
        self.U = jax.device_put(U0, self.shard)
        self.V = jax.device_put(V0, self.shard)
        self._sweep, _ = make_sweep(self.mesh, c.implicit, c.chunk)
        self._fit_steps = None
        self._u_idx_d = jax.device_put(self.u_idx, self.shard)
        self._u_rat_d = jax.device_put(self.u_rat, self.shard)
        self._i_idx_d = jax.device_put(self.i_idx, self.shard)
        self._i_rat_d = jax.device_put(self.i_rat, self.shard)
        self._lam = jnp.asarray(c.lam, dtype)
        self._alpha = jnp.asarray(c.alpha, dtype)

    # -- training ---------------------------------------------------------

    def step(self):
        """One full ALS iteration (users then items), two jitted sweeps."""
        with jax.default_matmul_precision(self.config.matmul_precision):
            self.U = self._sweep(self.V, self._u_idx_d, self._u_rat_d,
                                 self._lam, self._alpha)
            self.V = self._sweep(self.U, self._i_idx_d, self._i_rat_d,
                                 self._lam, self._alpha)

    def fit_steps(self, iters: int):
        """Run ``iters`` full iterations inside ONE jitted program (traced
        iteration count — every count shares the compiled executable)."""
        if self._fit_steps is None:
            self._fit_steps = make_fit_steps(self.mesh, self.config.implicit,
                                             self.config.chunk)
        with jax.default_matmul_precision(self.config.matmul_precision):
            self.U, self.V = self._fit_steps(
                jnp.asarray(iters, jnp.int32), self.U, self.V,
                self._u_idx_d, self._u_rat_d, self._i_idx_d, self._i_rat_d,
                self._lam, self._alpha)

    def fit(self, iters: int | None = None, log=None):
        iters = self.config.iters if iters is None else iters
        stats = []
        for it in range(iters):
            t0 = time.perf_counter()
            self.step()
            # block_until_ready on sharded arrays can return early on some
            # experimental backends; fetching a slice forces materialization
            jax.block_until_ready((self.U, self.V))
            np.asarray(self.V[:1, :1])
            dt = time.perf_counter() - t0
            ex_s = self.data.nnz * 2 / dt
            stats.append({"iter": it, "sec": dt, "examples_per_sec": ex_s})
            if log:
                log(f"iter {it}: {dt:.3f}s  {ex_s:,.0f} examples/s")
        return stats

    # -- evaluation -------------------------------------------------------

    def loss(self) -> float:
        """ALS objective on observed entries (monitoring only).

        For the implicit model this is the observed-entry part plus
        regularization (the full iALS objective also sums unobserved pairs;
        this cheaper surrogate is only used to monitor progress)."""
        U = np.asarray(self.U)[:self.data.num_users]
        V = np.asarray(self.V)[:self.data.num_items]
        preds = np.einsum("nk,nk->n", U[self.data.user_ids],
                          V[self.data.item_ids])
        c = self.config
        if c.implicit:
            w = 1.0 + c.alpha * self.data.ratings
            err = float((w * (1.0 - preds) ** 2).sum())
        else:
            err = float(((self.data.ratings - preds) ** 2).sum())
        reg = c.lam * (float((U ** 2).sum()) + float((V ** 2).sum()))
        return err + reg

    def full_implicit_loss(self) -> float:
        """Exact iALS objective including all unobserved (u,i) pairs, via the
        Gramian identity: sum_ui (u.v)^2 = tr((U^T U)(V^T V))."""
        c = self.config
        U = np.asarray(self.U)[:self.data.num_users].astype(np.float64)
        V = np.asarray(self.V)[:self.data.num_items].astype(np.float64)
        preds = np.einsum("nk,nk->n", U[self.data.user_ids],
                          V[self.data.item_ids])
        w = c.alpha * self.data.ratings
        obs = float((w * (1.0 - preds) ** 2).sum()) \
            + float((1.0 - preds) ** 2 - preds ** 2).sum()
        allpairs = float(np.trace((U.T @ U) @ (V.T @ V)))
        reg = c.lam * (float((U ** 2).sum()) + float((V ** 2).sum()))
        return obs + allpairs + reg

    def topk(self, k: int = 20, exclude_train: bool = True,
             chunk: int = 4096) -> np.ndarray:
        """Brute-force top-k retrieval: scores = U V^T, lax.top_k per user."""
        nu = self.data.num_users
        ni = self.data.num_items
        out = np.zeros((nu, k), dtype=np.int32)

        @jax.jit
        def score_chunk(Uc, V, idx):
            s = jnp.einsum("ck,mk->cm", Uc, V,
                           preferred_element_type=jnp.float32)
            if exclude_train:
                rows = jnp.arange(s.shape[0])[:, None]
                gi = jnp.where(idx >= 0, idx, 0)
                delta = jnp.where(idx >= 0, -jnp.inf, 0.0)
                s = s.at[rows, gi].add(delta)
            return jax.lax.top_k(s, k)[1]

        V = self.V[:ni]
        for c0 in range(0, nu, chunk):
            hi = min(c0 + chunk, nu)
            got = score_chunk(self.U[c0:c0 + chunk], V,
                              jnp.asarray(self.u_idx[c0:c0 + chunk]))
            out[c0:hi] = np.asarray(got)[:hi - c0]
        return out

    def evaluate(self, test: Interactions, k_recall: int = 20,
                 k_ndcg: int = 10) -> dict:
        """recall@20 and NDCG@10 against a held-out set (vectorised)."""
        topk = self.topk(k=max(k_recall, k_ndcg))
        ni = int(self.data.num_items)
        test_keys = np.sort(test.user_ids.astype(np.int64) * ni
                            + test.item_ids)
        nrel = np.bincount(test.user_ids, minlength=test.num_users)
        users = np.flatnonzero(nrel > 0)
        keys = users[:, None].astype(np.int64) * ni + topk[users]
        hit = np.isin(keys, test_keys)
        recall = (hit[:, :k_recall].sum(axis=1)
                  / np.minimum(nrel[users], k_recall))
        discount = 1.0 / np.log2(np.arange(2, k_ndcg + 2))
        dcg = (hit[:, :k_ndcg] * discount[None, :]).sum(axis=1)
        cum = np.concatenate([[0.0], np.cumsum(discount)])
        idcg = cum[np.minimum(nrel[users], k_ndcg)]
        return {"recall@%d" % k_recall: float(recall.mean()),
                "ndcg@%d" % k_ndcg: float((dcg / idcg).mean()),
                "users_evaluated": int(len(users))}
