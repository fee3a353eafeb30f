"""Batched dense-block panel microbenchmark — the TPU analogue of the
reference's Misc/cublas benchmark (Misc/cublas/cublas_demo.c): 2^16
independent supernodal panel updates (SYRK n=64,k=32 + GEMM m=n=64,k=32),
timed under different batching strategies. The reference's conclusion — that
batched execution of many small panel updates is the key throughput lever —
is re-validated here for the MXU.

Run: python -m spfx.bench.panels
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

BATCH = 1 << 16
N, M, K = 64, 64, 32       # ref dims: cublas_demo.h:14-17


def _sync(out):
    """Force completion with a data-dependent host fetch:
    block_until_ready has been observed to return before compute completes
    on tunneled backends (axon), silently timing enqueue instead."""
    import numpy as _np
    leaves = jax.tree_util.tree_leaves(out)
    return float(_np.asarray(jnp.sum(leaves[0])).real)


def _time(fn, *args, reps=5):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def strategy_batched(A, B):
    """One fused batched SYRK + GEMM over the full task set."""
    syrk = jnp.einsum("bnk,bmk->bnm", A, A, preferred_element_type=A.dtype)
    gemm = jnp.einsum("bmk,bnk->bmn", B, A, preferred_element_type=A.dtype)
    return syrk, gemm


@partial(jax.jit, static_argnames=("chunk",))
def strategy_chunked(A, B, chunk: int = 1024):
    """lax.map over chunks — models a per-stream loop of medium batches."""
    Ac = A.reshape(-1, chunk, N, K)
    Bc = B.reshape(-1, chunk, M, K)

    def body(args):
        a, b = args
        return (jnp.einsum("bnk,bmk->bnm", a, a,
                           preferred_element_type=a.dtype),
                jnp.einsum("bmk,bnk->bmn", b, a,
                           preferred_element_type=a.dtype))

    return jax.lax.map(body, (Ac, Bc))


@jax.jit
def strategy_pallas(A, B):
    """Hand-written Pallas kernel (the production panel-update kernel) —
    the TPU analogue of the reference's custom batched CUDA kernels
    (strategy 3, Misc/cublas/cublas_demo.c:236 -> cublas_demo_kernel.cu)."""
    from spfx.kernels import pallas_blocks
    return pallas_blocks.syrk_gemm_batched(A, B)


def flops() -> float:
    return BATCH * (2.0 * N * N * K + 2.0 * M * N * K)


def main():
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((BATCH, N, K)), dtype=dtype)
    B = jnp.asarray(rng.standard_normal((BATCH, M, K)), dtype=dtype)
    fl = flops()

    results = {}
    t = _time(strategy_batched, A, B)
    results["batched_single_call"] = fl / t / 1e9
    t = _time(strategy_chunked, A, B)
    results["chunked_1024"] = fl / t / 1e9
    # custom-kernel strategy (ref strategy 3): skipped only where Pallas
    # cannot run (non-TPU backends without interpret mode)
    try:
        t = _time(strategy_pallas, A, B)
        results["pallas_custom_kernel"] = fl / t / 1e9
    except Exception as e:
        print(f"pallas strategy unavailable: {e!r}", file=sys.stderr)
    # single-call loop on a slice (dispatch-bound; extrapolated like the
    # reference's strategy-1 loop)
    sub = 256
    t0 = time.perf_counter()
    outs = []
    for i in range(sub):
        outs.append(strategy_batched(A[i:i + 1], B[i:i + 1]))
    _sync(outs)
    t = (time.perf_counter() - t0) * (BATCH / sub)
    results["per_task_loop_extrapolated"] = fl / t / 1e9

    base = results["per_task_loop_extrapolated"]
    for k, v in results.items():
        print(f"{k:32s} {v:10.1f} GFLOP/s   x{v / base:8.1f} vs loop",
              file=sys.stderr)
    return results


if __name__ == "__main__":
    main()
