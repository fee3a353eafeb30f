"""Batched window-gather strategies on TPU: lax.gather (current _win_gather)
vs explicit fori_loop of dynamic-slices (trip-controlled, unrolled).
Measured inside a scan-of-switch like the production engine."""
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
NSTEP = 200
B = 1024
WIN = 1024          # 32x32 window


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
starts = jnp.asarray(
    rng.integers(0, STORAGE - WIN - 8, (NSTEP, B)).astype(np.int32))
nreal = jnp.asarray(np.full(NSTEP, int(B * 0.6), np.int32))

_FILL = lax.GatherScatterMode.FILL_OR_DROP


def g_gather(L, st, nr):
    out = lax.gather(
        L, st.reshape(-1, 1),
        lax.GatherDimensionNumbers(offset_dims=(1,),
                                   collapsed_slice_dims=(),
                                   start_index_map=(0,)),
        slice_sizes=(WIN,), mode=_FILL, fill_value=0)
    return out


def g_loop(L, st, nr, unroll):
    buf = jnp.zeros((B, WIN), jnp.float32)

    def body(j, buf):
        for u in range(unroll):
            i = j * unroll + u
            s = lax.dynamic_index_in_dim(st, i, 0, keepdims=False)
            w = lax.dynamic_slice(L, (jnp.maximum(s, 0),), (WIN,))
            w = jnp.where(s >= 0, w, 0.0)
            buf = lax.dynamic_update_slice(buf, w[None], (i, jnp.int32(0)))
        return buf

    trips = (nr + unroll - 1) // unroll
    return lax.fori_loop(0, trips, body, buf)


def build(mode, unroll=1):
    def br(L, st, nr):
        if mode == "gather":
            G = g_gather(L, st, nr)
        else:
            G = g_loop(L, st, nr, unroll)
        return G.sum() * 1e-30

    def once(L):
        def body(L, xs):
            st, nr = xs
            acc = br(L, st, nr)
            return L.at[0].add(acc), None

        L, _ = lax.scan(body, L, (starts, nreal))
        return L

    @jax.jit
    def run(reps, L0):
        return lax.fori_loop(
            0, reps, lambda r, L: once(L + jnp.float32(1e-30) * r), L0)

    return run


L0 = jnp.zeros((STORAGE,), jnp.float32)
for name, mode, unroll in [
        ("lax.gather (B=1024 padded)", "gather", 1),
        ("loop u=1 trip=0.6B", "loop", 1),
        ("loop u=4 trip=0.6B", "loop", 4),
        ("loop u=8 trip=0.6B", "loop", 8),
        ("loop u=16 trip=0.6B", "loop", 16)]:
    t0 = time.time()
    run = build(mode, unroll)
    dt = slope(run, L0)
    eff = dt / NSTEP / B * 1e9
    print(f"{name:>28}: {dt/NSTEP*1e6:8.1f} us/step  "
          f"({eff:6.1f} ns/window-of-B)  ({time.time()-t0:.0f}s)",
          flush=True)
