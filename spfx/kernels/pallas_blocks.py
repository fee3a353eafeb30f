"""Pallas TPU kernels for batched supernodal panel math.

The TPU counterpart of the reference's hand-written batched CUDA kernels
(Misc/cublas/cublas_demo_kernel.cu: one threadblock per task, shared-memory
staged tiles). Here: one grid step per task slab, panel tiles staged in VMEM,
MXU matmuls, SYRK+GEMM fused so the shared A-panel tile is loaded once.

These kernels fall back to interpreter mode off-TPU so the same code paths
are exercised by the CPU test suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------------
# Fused batched SYRK + GEMM panel update:
#   S[b] = A[b] @ A[b]^T          (n x n)
#   G[b] = B[b] @ A[b]^T          (m x n)
# (ref launch_syrk_gemm, cublas_demo_kernel.cu:99-108)
# --------------------------------------------------------------------------

def _syrk_gemm_kernel(a_ref, b_ref, s_ref, g_ref):
    a = a_ref[...]
    at = jnp.swapaxes(a, -1, -2)
    s_ref[...] = jax.lax.dot_general(
        a, at, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=s_ref.dtype)
    g_ref[...] = jax.lax.dot_general(
        b_ref[...], at, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=g_ref.dtype)


@functools.partial(jax.jit, static_argnames=("slab",))
def syrk_gemm_batched(A, B, slab: int = 32):
    """A: (batch, n, k), B: (batch, m, k) -> (S, G). batch % slab == 0.

    slab bounds VMEM residency: in+out tiles must fit the ~16MB scoped
    limit (slab=64 at n=m=64 OOMs on v5e: 16.29M > 16M)."""
    bt, n, k = A.shape
    m = B.shape[1]
    grid = (bt // slab,)
    return pl.pallas_call(
        _syrk_gemm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((slab, n, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slab, m, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((slab, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slab, m, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt, n, n), A.dtype),
            jax.ShapeDtypeStruct((bt, m, n), A.dtype),
        ],
        interpret=_interpret(),
    )(A, B)


# --------------------------------------------------------------------------
# Batched small Cholesky, batch-in-lanes layout:
# factor many tiny SPD matrices at once by vectorizing the elimination
# recurrence across the batch (the VPU's lane dimension), instead of running
# one serial potrf per matrix. Input (batch, c, c) with c small (<= 32).
# --------------------------------------------------------------------------

def _chol_lanes_kernel(d_ref, l_ref):
    c = d_ref.shape[1]
    A = d_ref[...]                       # (slab, c, c)

    def col(j, A):
        # extract column j with a one-hot contraction (Mosaic cannot lower a
        # dynamic lane index like A[:, :, j] / A.at[:, :, j].set)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
        onehot = (lane == j).astype(A.dtype)              # (1, 1, c)
        Acolj = jnp.sum(A * onehot, axis=2)               # (slab, c)
        piv = jax.lax.rsqrt(jnp.sum(Acolj
                                    * (jax.lax.broadcasted_iota(
                                        jnp.int32, (1, c), 1) == j), axis=1))
        colj = Acolj * piv[:, None]                       # (slab, c)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
        colj = jnp.where(idx >= j, colj, 0.0)
        # rank-1 update of the trailing block only (cols > j): finished
        # columns must not be touched again
        ucolj = jnp.where(idx > j, colj, 0.0)
        A = A - colj[:, :, None] * ucolj[:, None, :]
        # write column j back via one-hot select
        A = jnp.where(onehot > 0, colj[:, :, None], A)
        return A

    A = jax.lax.fori_loop(0, c, col, A)
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    colx = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    l_ref[...] = jnp.where((row >= colx)[None], A, 0.0)


@functools.partial(jax.jit, static_argnames=("slab",))
def cholesky_small_batched(D, slab: int = 256):
    """(batch, c, c) SPD -> lower Cholesky factors; batch % slab == 0."""
    bt, c, _ = D.shape
    return pl.pallas_call(
        _chol_lanes_kernel,
        grid=(bt // slab,),
        in_specs=[pl.BlockSpec((slab, c, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((slab, c, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bt, c, c), D.dtype),
        interpret=_interpret(),
    )(D)
