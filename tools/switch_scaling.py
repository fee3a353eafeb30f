"""Measure the mega-scan's per-step cost structure on hardware: how does a
scan-of-switch step scale with (#branches, #tables/branch, region size), and
is a fori_loop of dynamic-slice work INSIDE one branch cheap (the proposed
chain-step design)?  All bodies are region-return (the no-copy form).
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

STORAGE = 64 * 1024 * 1024          # 256MB f32, like 48^3
NSTEP = 1000


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


def build(nbranch, ntab, smax, inner=0, tabrows=64):
    """One scan over NSTEP steps, switch over nbranch region-return branches.
    Each branch reads row i of its ntab tables, dynamic-slices an smax
    region, adds a tiny value, returns (region, offset). inner>0 adds a
    fori_loop of that many (4KB dynamic-slice read + add) iterations."""
    rng = np.random.default_rng(0)
    tables = [[jnp.asarray(rng.integers(0, 1000, (32, tabrows), np.int32))
               for _ in range(ntab)] for _ in range(nbranch)]
    cls = jnp.asarray(rng.integers(0, nbranch, NSTEP, np.int32))
    chk = jnp.asarray(rng.integers(0, 32, NSTEP, np.int32))
    offs = jnp.asarray(
        rng.integers(0, STORAGE - smax - 8, NSTEP).astype(np.int32))

    def mk(tabs):
        def br(L, i, off, tabs=tabs):
            rows = [lax.dynamic_index_in_dim(t, i, 0, keepdims=False)
                    for t in tabs]
            acc = jnp.float32(0)
            for r in rows:
                acc = acc + r[0].astype(jnp.float32) * 1e-30
            reg = lax.dynamic_slice(L, (off,), (smax,))
            if inner:
                def body(j, reg):
                    w = lax.dynamic_slice(
                        L, ((off + j * 1024) % (STORAGE - 1024),), (1024,))
                    return reg.at[:1024].add(w * 1e-30)
                reg = lax.fori_loop(0, inner, body, reg)
            return reg + acc, off

        return br

    brs = [mk(t) for t in tables]

    def once(L):
        def body(L, xs):
            c, i, off = xs
            reg, off = lax.switch(c, brs, L, i, off)
            return lax.dynamic_update_slice(L, reg, (off,)), None

        L, _ = lax.scan(body, L, (cls, chk, offs))
        return L

    @jax.jit
    def run(reps, L0):
        def body(r, L):
            return once(L + jnp.float32(1e-30) * r)
        return lax.fori_loop(0, reps, body, L0)

    return run


L0 = jnp.zeros((STORAGE,), jnp.float32)
print(f"storage {STORAGE*4/1e6:.0f}MB, {NSTEP} steps/scan", flush=True)
cases = [
    ("b1   t8  r8K",    1,  8, 8192, 0),
    ("b4   t8  r8K",    4,  8, 8192, 0),
    ("b16  t8  r8K",   16,  8, 8192, 0),
    ("b64  t8  r8K",   64,  8, 8192, 0),
    ("b96  t8  r8K",   96,  8, 8192, 0),
    ("b16  t1  r8K",   16,  1, 8192, 0),
    ("b96  t1  r8K",   96,  1, 8192, 0),
    ("b16  t8  r2M",   16,  8, 1 << 21, 0),
    ("b96  t8  r2M",   96,  8, 1 << 21, 0),
    ("b16  t8  r8K i8", 16, 8, 8192, 8),
    ("b16  t8  r8K i32", 16, 8, 8192, 32),
]
for name, nb, nt, sm, inner in cases:
    t0 = time.time()
    run = build(nb, nt, sm, inner)
    dt = slope(run, L0)
    print(f"{name:>18}: {dt/NSTEP*1e6:8.1f} us/step   "
          f"(compile+run {time.time()-t0:.0f}s)", flush=True)
