"""Does a pallas_call with input_output_aliases={0:0} inside a lax.switch
branch (scan body) alias the carry through, or does XLA still copy the full
carry per step (round-4 pathology, tools/switch_inplace.py mode B)?

  A. region-return baseline (global smax, write outside switch)
  E. aliased pallas: branch = pallas_call(L, tabrow) -> L (in-place DMA
     read-modify-write of its own exact region inside the kernel)
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

STORAGE = 64 * 1024 * 1024
NSTEP = 1000
SMAX = 1 << 20            # 4MB region for the baseline
SIZES = [2048, 1 << 14, 1 << 17, 1 << 20]   # per-branch true sizes 8KB..4MB


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


rng = np.random.default_rng(0)
nb = 4
cls = jnp.asarray(rng.integers(0, nb, NSTEP, np.int32))
offs = jnp.asarray((rng.integers(0, (STORAGE - max(SIZES)) // 1024, NSTEP)
                    * 1024).astype(np.int32))


def alias_branch(size):
    CH = min(size, 1 << 15)      # DMA chunk: 128KB

    def kernel(off_ref, L_ref, out_ref, buf, sem_in, sem_out):
        def body(i, _):
            s = pl.multiple_of(((off_ref[0] // 1024) * 1024) + i * CH, 1024)
            d1 = pltpu.make_async_copy(L_ref.at[pl.ds(s, CH)], buf, sem_in)
            d1.start(); d1.wait()
            buf[:] = buf[:] + 1e-30
            d2 = pltpu.make_async_copy(buf, L_ref.at[pl.ds(s, CH)], sem_out)
            d2.start(); d2.wait()
            return 0
        lax.fori_loop(0, size // CH, body, 0)

    def br(L, off):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((STORAGE,), jnp.float32),
            input_output_aliases={1: 0},
            scratch_shapes=[pltpu.VMEM((CH,), jnp.float32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
        )(off.reshape(1), L)
    return br


def build(mode):
    if mode == "E":
        brs = [alias_branch(SIZES[b]) for b in range(nb)]

        def once(L):
            def body(L, xs):
                c, off = xs
                return lax.switch(c, brs, L, off), None
            L, _ = lax.scan(body, L, (cls, offs))
            return L
    else:
        def mk(b):
            def br(L, off):
                reg = lax.dynamic_slice(L, (off,), (SMAX,))
                return reg + jnp.float32(1e-30) * (b + 1), off
            return br
        brs = [mk(b) for b in range(nb)]

        def once(L):
            def body(L, xs):
                c, off = xs
                reg, off = lax.switch(c, brs, L, off)
                return lax.dynamic_update_slice(L, reg, (off,)), None
            L, _ = lax.scan(body, L, (cls, offs))
            return L

    @jax.jit
    def run(reps, L0):
        def body(r, L):
            return once(L + jnp.float32(1e-30) * r)
        return lax.fori_loop(0, reps, body, L0)
    return run


L0 = jnp.zeros((STORAGE,), jnp.float32)
for mode, name in [("A", f"region-return smax={SMAX*4>>20}MB"),
                   ("E", "aliased pallas in switch, exact sizes")]:
    t0 = time.time()
    run = build(mode)
    try:
        dt = slope(run, L0)
        print(f"{name:>42}: {dt/NSTEP*1e6:8.1f} us/step  "
              f"({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:>42}: FAILED {type(e).__name__}: {e}", flush=True)
