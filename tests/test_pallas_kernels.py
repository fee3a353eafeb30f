"""Pallas kernel correctness vs XLA references (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from spfx.kernels.pallas_blocks import syrk_gemm_batched, \
    cholesky_small_batched


def test_syrk_gemm_matches_einsum():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((128, 16, 8)), dtype=jnp.float32)
    B = jnp.asarray(rng.standard_normal((128, 16, 8)), dtype=jnp.float32)
    S, G = syrk_gemm_batched(A, B, slab=32)
    S_ref = jnp.einsum("bnk,bmk->bnm", A, A)
    G_ref = jnp.einsum("bmk,bnk->bmn", B, A)
    assert np.allclose(S, S_ref, atol=1e-4)
    assert np.allclose(G, G_ref, atol=1e-4)


def test_small_cholesky_matches_numpy():
    rng = np.random.default_rng(1)
    c, bt = 8, 64
    M = rng.standard_normal((bt, c, c))
    D = np.einsum("bij,bkj->bik", M, M) + 3 * np.eye(c)
    L = np.asarray(cholesky_small_batched(
        jnp.asarray(D, dtype=jnp.float32), slab=16))
    for b in range(bt):
        Lref = np.linalg.cholesky(D[b])
        assert np.abs(L[b] - Lref).max() < 1e-3 * np.abs(Lref).max()
    # strictly lower triangular storage with zero upper
    assert np.abs(np.triu(L, 1)).max() == 0.0
