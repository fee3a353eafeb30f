"""ALS / iALS matrix-factorization recommender on batched Cholesky solves.

Per BASELINE.json's north star: user/item embedding tables are row-sharded
across a device mesh; each half-iteration solves a batch of k x k regularized
normal equations with the batched Cholesky kernels (spfx.kernels.dense); the
read-side factor table is replicated on demand by XLA (all_gather over ICI)
because the padded interaction gather indexes arbitrary rows.

Implicit ALS (Hu-Koren-Volinsky): minimize
  sum_ui c_ui (p_ui - u_u . v_i)^2 + lam (|U|^2 + |V|^2),
  c_ui = 1 + alpha r_ui, p_ui = [r_ui > 0],
using the Gramian trick: A_u = V^T V + V_u^T diag(c-1) V_u + lam I.

Explicit ALS: standard alternating ridge regression on observed entries.

All shapes are static: interactions are degree-capped padded index arrays
(spfx.recsys.data.padded_rows), users/items processed in fixed-size chunks.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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
    chunk: int = 4096           # rows solved per kernel launch
    dtype: str = "float32"
    seed: int = 0


# ----------------------------------------------------------------------------
# one-sided update: solve the normal equations for every row of one table
# ----------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("implicit",), donate_argnums=0)
def _update_chunk(Xout_chunk, Yother, idx, rat, lam, alpha, implicit: bool):
    """Solve rows of one factor table given the other table.

    Xout_chunk: (C, k) rows being replaced (donated, only shape/dtype used)
    Yother:     (m+1, k) the other table with a zero row appended at index m
                (padding rows gather zeros — same sentinel trick as the
                sparse engine's ZERO slot)
    idx:        (C, D) padded neighbor ids (-1 padding)
    rat:        (C, D) ratings (0 padding)
    """
    k = Yother.shape[1]
    m = Yother.shape[0] - 1
    gi = jnp.where(idx >= 0, idx, m)
    Yg = Yother[gi]                               # (C, D, k)
    mask = (idx >= 0).astype(Yg.dtype)
    if implicit:
        cm1 = alpha * rat                          # c - 1, 0 on padding
        G = jnp.einsum("nk,nl->kl", Yother[:m], Yother[:m],
                       preferred_element_type=Yg.dtype)
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
        # pad table sizes so chunks and shards divide evenly
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
        self.shard = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
        self.U = jax.device_put(
            (rng.standard_normal((self.nu, c.rank)) * scale).astype(dtype),
            self.shard)
        self.V = jax.device_put(
            (rng.standard_normal((self.ni, c.rank)) * scale).astype(dtype),
            self.shard)

    # -- core sweeps ------------------------------------------------------

    def _sweep(self, Xout, Yother, idx, rat):
        """Update every row of Xout from Yother over fixed-size chunks."""
        c = self.config
        m = Yother.shape[0]
        Yz = jnp.concatenate(
            [Yother, jnp.zeros((1, c.rank), Yother.dtype)], axis=0)
        outs = []
        for c0 in range(0, Xout.shape[0], c.chunk):
            chunk = Xout[c0:c0 + c.chunk]
            outs.append(_update_chunk(
                chunk, Yz,
                jnp.asarray(idx[c0:c0 + c.chunk]),
                jnp.asarray(rat[c0:c0 + c.chunk]),
                jnp.asarray(c.lam, Yother.dtype),
                jnp.asarray(c.alpha, Yother.dtype), c.implicit))
        return jnp.concatenate(outs, axis=0)

    def step(self):
        """One full ALS iteration (users then items)."""
        self.U = self._sweep(self.U, self.V, self.u_idx, self.u_rat)
        self.V = self._sweep(self.V, self.U, self.i_idx, self.i_rat)

    def fit(self, iters: int | None = None, log=None):
        iters = self.config.iters if iters is None else iters
        stats = []
        for it in range(iters):
            t0 = time.perf_counter()
            self.step()
            jax.block_until_ready((self.U, self.V))
            dt = time.perf_counter() - t0
            ex_s = self.data.nnz * 2 / dt
            stats.append({"iter": it, "sec": dt, "examples_per_sec": ex_s})
            if log:
                log(f"iter {it}: {dt:.3f}s  {ex_s:,.0f} examples/s")
        return stats

    # -- evaluation -------------------------------------------------------

    def loss(self) -> float:
        """Implicit-ALS objective on observed entries (monitoring only)."""
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

    def topk(self, k: int = 20, exclude_train: bool = True,
             chunk: int = 4096) -> np.ndarray:
        """Brute-force top-k retrieval: scores = U V^T, lax.top_k per user."""
        nu = self.data.num_users
        out = np.zeros((nu, k), dtype=np.int32)

        @jax.jit
        def score_chunk(Uc, V, idx):
            s = jnp.einsum("ck,mk->cm", Uc, V,
                           preferred_element_type=jnp.float32)
            if exclude_train:
                # mask train items (padded idx -1 -> harmless extra col)
                oob = s.shape[1]
                gi = jnp.where(idx >= 0, idx, oob - 1 + 0)
                mask = jnp.zeros_like(s).at[
                    jnp.arange(s.shape[0])[:, None], gi].set(
                    jnp.where(idx >= 0, -jnp.inf, 0.0))
                s = s + mask
            return jax.lax.top_k(s, k)[1]

        V = self.V[:self.data.num_items]
        for c0 in range(0, nu, chunk):
            hi = min(c0 + chunk, nu)
            got = score_chunk(self.U[c0:c0 + chunk],
                              V, jnp.asarray(self.u_idx[c0:c0 + chunk]))
            out[c0:hi] = np.asarray(got)[:hi - c0]
        return out

    def evaluate(self, test: Interactions, k_recall: int = 20,
                 k_ndcg: int = 10) -> dict:
        """recall@20 and NDCG@10 against a held-out interaction set."""
        topk = self.topk(k=max(k_recall, k_ndcg))
        # group test items per user
        order = np.argsort(test.user_ids, kind="stable")
        u, i = test.user_ids[order], test.item_ids[order]
        starts = np.searchsorted(u, np.arange(test.num_users))
        ends = np.searchsorted(u, np.arange(test.num_users), side="right")
        recs, ndcgs = [], []
        discount = 1.0 / np.log2(np.arange(2, k_ndcg + 2))
        for uu in range(test.num_users):
            s, e = starts[uu], ends[uu]
            if e == s:
                continue
            rel = set(i[s:e].tolist())
            hits = [int(it in rel) for it in topk[uu][:k_recall]]
            recs.append(sum(hits) / min(len(rel), k_recall))
            h10 = np.array([int(it in rel) for it in topk[uu][:k_ndcg]],
                           dtype=np.float64)
            idcg = discount[:min(len(rel), k_ndcg)].sum()
            ndcgs.append(float((h10 * discount).sum() / idcg))
        return {"recall@%d" % k_recall: float(np.mean(recs)),
                "ndcg@%d" % k_ndcg: float(np.mean(ndcgs)),
                "users_evaluated": len(recs)}
