"""Does the ~1.2us/branch/step switch penalty persist when every branch is a
SINGLE pallas_call (region-return)? Sweeps branch count with a representative
kernel body: 3.15MB region DMA copy-through + 64 window DMAs + small dots.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

STORAGE = 64 * 1024 * 1024
NSTEP = 1000
SMAX = 786432
B, WIN = 64, 2048

def sync(x): return float(np.asarray(jnp.sum(x)))

def slope(fn, *args, lo=1, hi=3, best_of=3):
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

rng = np.random.default_rng(0)
offs = jnp.asarray((rng.integers(0, (STORAGE - SMAX) // 1024, NSTEP) * 1024).astype(np.int32))
starts = jnp.asarray((rng.integers(0, (STORAGE - WIN) // 1024, (NSTEP, B)) * 1024).astype(np.int32))

def make_branch(bid):
    CH = 1 << 16   # 256KB region DMA chunks

    def kernel(off_ref, st_ref, L_ref, out_ref, acc, gbuf, sems, gsem):
        # region copy-through: L[off:off+SMAX] -> out (chunked DMA)
        def rbody(i, _):
            s = pl.multiple_of((off_ref[0] // 1024) * 1024 + i * CH, 1024)
            d = pl.multiple_of(i * CH, 1024)
            dma = pltpu.make_async_copy(L_ref.at[pl.ds(s, CH)],
                                  out_ref.at[pl.ds(d, CH)], sems.at[0])
            dma.start(); dma.wait()
            return 0
        lax.fori_loop(0, SMAX // CH, rbody, 0)
        # 64 window DMAs into VMEM + a dot every 8 windows
        def wbody(i, _):
            s = pl.multiple_of((st_ref[i] // 1024) * 1024, 1024)
            dma = pltpu.make_async_copy(L_ref.at[pl.ds(s, WIN)],
                                  gbuf.at[pl.ds(0, WIN)], gsem)
            dma.start(); dma.wait()
            return 0
        lax.fori_loop(0, B, wbody, 0)
        g = gbuf[:].reshape(16, 128)
        c = jax.lax.dot_general(g, g, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc[0, 0] = jnp.sum(c) * (1e-30 * (bid + 1))

    def br(L, off, st):
        out, _ = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_shape=[jax.ShapeDtypeStruct((SMAX,), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((WIN,), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SemaphoreType.DMA],
        )(off.reshape(1), st, L)
        return out, off
    return br

def build(nb):
    brs = [make_branch(b) for b in range(nb)]
    cls = jnp.asarray(rng.integers(0, nb, NSTEP, np.int32))

    def once(L):
        def body(L, xs):
            c, off, st = xs
            reg, off = lax.switch(c, brs, L, off, st)
            return lax.dynamic_update_slice(L, reg, (off,)), None
        L, _ = lax.scan(body, L, (cls, offs, starts))
        return L

    @jax.jit
    def run(reps, L0):
        return lax.fori_loop(0, reps, lambda r, L: once(L + jnp.float32(1e-30) * r), L0)
    return run

L0 = jnp.zeros((STORAGE,), jnp.float32)
for nb in (1, 8, 59):
    t0 = time.time()
    try:
        run = build(nb)
        dt = slope(run, L0)
        print(f"pallas-branch switch nb={nb:3d}: {dt/NSTEP*1e6:7.1f} us/step  ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"pallas-branch switch nb={nb:3d}: FAILED {type(e).__name__} {str(e)[:200]}", flush=True)
