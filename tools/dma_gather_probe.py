"""Pallas DMA window gather vs lax.gather on TPU: B windows of `win` f32
elements at arbitrary element offsets, NS DMAs in flight."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

STORAGE = 64 * 1024 * 1024
NSTEP = 200
B = 1024
WIN = 1024
NS = 8


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def slope(fn, *args, lo=1, hi=5, best_of=3):
    sync(fn(jnp.int32(lo), *args))
    dt = float("inf")
    for _ in range(best_of):
        t = {}
        for r in (lo, hi):
            t0 = time.perf_counter()
            sync(fn(jnp.int32(r), *args))
            t[r] = time.perf_counter() - t0
        dt = min(dt, max(t[hi] - t[lo], 1e-9) / (hi - lo))
    return dt


def dma_gather(L, starts, win: int, ns: int = NS):
    Bn = starts.shape[0]
    lim = L.shape[0] - win

    def kernel(starts_ref, L_ref, out_ref):
        def body(sems):
            def copy(i, slot):
                s = jnp.clip(starts_ref[i], 0, lim)
                return pltpu.make_async_copy(
                    L_ref.at[pl.ds(s, win)], out_ref.at[i],
                    sems.at[slot])

            for k in range(min(ns, Bn)):
                copy(jnp.int32(k), jnp.int32(k % ns)).start()

            def loop(i, _):
                copy(i, i % ns).wait()

                @pl.when(i + ns < Bn)
                def _():
                    copy(i + ns, (i + ns) % ns).start()

                return 0

            lax.fori_loop(0, Bn, loop, 0)

        pl.run_scoped(body, pltpu.SemaphoreType.DMA((ns,)))

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((Bn, win), L.dtype),
    )(starts, L)


rng = np.random.default_rng(0)
starts = jnp.asarray(
    rng.integers(0, STORAGE - WIN - 8, (NSTEP, B)).astype(np.int32))

_FILL = lax.GatherScatterMode.FILL_OR_DROP


def build(mode, ns=NS):
    def br(L, st):
        if mode == "gather":
            G = lax.gather(
                L, st.reshape(-1, 1),
                lax.GatherDimensionNumbers(offset_dims=(1,),
                                           collapsed_slice_dims=(),
                                           start_index_map=(0,)),
                slice_sizes=(WIN,), mode=_FILL, fill_value=0)
        else:
            G = dma_gather(L, st, WIN, ns)
        return G.sum() * 1e-30

    def once(L):
        def body(L, xs):
            return L.at[0].add(br(L, xs)), None

        L, _ = lax.scan(body, L, starts)
        return L

    @jax.jit
    def run(reps, L0):
        return lax.fori_loop(
            0, reps, lambda r, L: once(L + jnp.float32(1e-30) * r), L0)

    return run


# correctness check first
L0 = jnp.arange(STORAGE, dtype=jnp.float32) * 1e-6
st0 = starts[0]
ref = np.stack([np.asarray(L0[int(s):int(s) + WIN]) for s in np.asarray(st0)])
got = np.asarray(dma_gather(L0, st0, WIN))
print("dma_gather correct:", np.array_equal(got, ref), flush=True)

L0 = jnp.zeros((STORAGE,), jnp.float32)
for name, mode, ns in [("lax.gather", "gather", 0),
                       ("dma ns=4", "dma", 4),
                       ("dma ns=8", "dma", 8),
                       ("dma ns=16", "dma", 16)]:
    t0 = time.time()
    run = build(mode, ns)
    dt = slope(run, L0)
    print(f"{name:>12}: {dt/NSTEP*1e6:8.1f} us/step  "
          f"({dt/NSTEP/B*1e9:6.1f} ns/window)  ({time.time()-t0:.0f}s)",
          flush=True)
