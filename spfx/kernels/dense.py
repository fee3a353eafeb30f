"""Batched small dense solvers shared by the sparse panel engine and the
recommender layer (per-user/per-item regularized normal equations).

``batched_chol_solve`` is the recsys workhorse: solve (B, k, k) SPD systems
with (B, k, m) right-hand sides via batched Cholesky — the same potrf/trsm
primitives the supernodal engine uses for its panels (BASELINE.json north
star: the ALS layer is built on the factorization kernels)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def batched_cholesky(A):
    """(B, k, k) SPD -> lower Cholesky factors (reads lower triangle only)."""
    return lax.linalg.cholesky(A, symmetrize_input=False)


def batched_chol_solve(A, B):
    """Solve A X = B for (B,k,k) SPD A, (B,k,m) B, via chol + two trsm."""
    L = batched_cholesky(A)
    Y = lax.linalg.triangular_solve(L, B, left_side=True, lower=True)
    return lax.linalg.triangular_solve(L, Y, left_side=True, lower=True,
                                       transpose_a=True)


def regularized_gram(Y, lam):
    """G = Y^T Y + lam I — shared Gramian for iALS updates (k x k)."""
    k = Y.shape[-1]
    G = jnp.einsum("nk,nl->kl", Y, Y, preferred_element_type=Y.dtype)
    return G + lam * jnp.eye(k, dtype=Y.dtype)
