"""Can a lax.switch branch dynamic-update-slice the scan carry IN PLACE with
per-branch region sizes (current JAX/XLA), or does that still force the
full-carry copy measured in round 4?  Compares:
  A. region-return, global smax (current engine contract)
  B. branch writes carry via DUS, per-branch region size, returns carry
  C. B but every branch same (large) region size
  D. B with a small fori_loop of extra DUS writes inside the branch
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

STORAGE = 64 * 1024 * 1024
NSTEP = 1000
SIZES = [8192, 1 << 15, 1 << 17, 1 << 19, 1 << 21]   # 32KB .. 8MB


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
nb = 16
cls = jnp.asarray(rng.integers(0, nb, NSTEP, np.int32))
offs = jnp.asarray(
    rng.integers(0, STORAGE - max(SIZES) - 8, NSTEP).astype(np.int32))
tabs = [jnp.asarray(rng.integers(0, 1000, (32, 64), np.int32))
        for _ in range(nb)]


def build(mode):
    def mk(b):
        size = SIZES[b % len(SIZES)] if mode in ("B", "D") else max(SIZES)

        def br_ret(L, i, off, b=b):
            row = lax.dynamic_index_in_dim(tabs[b], i, 0, keepdims=False)
            reg = lax.dynamic_slice(L, (off,), (max(SIZES),))
            return reg + row[0].astype(jnp.float32) * 1e-30, off

        def br_dus(L, i, off, b=b, size=size):
            row = lax.dynamic_index_in_dim(tabs[b], i, 0, keepdims=False)
            reg = lax.dynamic_slice(L, (off,), (size,))
            reg = reg + row[0].astype(jnp.float32) * 1e-30
            L = lax.dynamic_update_slice(L, reg, (off,))
            if mode == "D":
                def body(j, L):
                    w = lax.dynamic_slice(L, (off + j * 256,), (256,))
                    return lax.dynamic_update_slice(
                        L, w + jnp.float32(1e-30), (off + j * 256,))
                L = lax.fori_loop(0, 4, body, L)
            return L

        return br_ret if mode == "A" else br_dus

    brs = [mk(b) for b in range(nb)]

    def once(L):
        if mode == "A":
            def body(L, xs):
                c, i, off = xs
                reg, off = lax.switch(c, brs, L, i, off)
                return lax.dynamic_update_slice(L, reg, (off,)), None
        else:
            def body(L, xs):
                c, i, off = xs
                return lax.switch(c, brs, L, i, off), None

        L, _ = lax.scan(body, L, (cls, jnp.arange(NSTEP) % 32, offs))
        return L

    @jax.jit
    def run(reps, L0):
        def body(r, L):
            return once(L + jnp.float32(1e-30) * r)
        return lax.fori_loop(0, reps, body, L0)

    return run


L0 = jnp.zeros((STORAGE,), jnp.float32)
for mode, desc in [("A", "region-return, global smax=2M"),
                   ("B", "branch DUS, per-branch size 8K..2M"),
                   ("C", "branch DUS, all 2M"),
                   ("D", "branch DUS mixed + 4-iter DUS loop")]:
    t0 = time.time()
    run = build(mode)
    dt = slope(run, L0)
    print(f"{mode} {desc:>38}: {dt/NSTEP*1e6:8.1f} us/step  "
          f"({time.time()-t0:.0f}s)", flush=True)
