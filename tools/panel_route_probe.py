"""A/B the panel factorization routes at the real chain shapes: blocked
(NB potrf_inv_lanes steps + transposes) vs wide vs lanes vs xla, at small B
(chain panel buckets are B=1..8)."""
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
from spfx.kernels import blocks


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def slope(fn, *args, lo=1, hi=9, best_of=3):
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


CASES = [(1, 256, 2560), (2, 256, 1024), (4, 128, 512), (4, 128, 384),
         (8, 64, 512)]

rng = np.random.default_rng(0)
for B, cp, rbp in CASES:
    w = jnp.full((B,), cp, jnp.int32)
    nb = jnp.full((B,), rbp - 32, jnp.int32)
    X = rng.standard_normal((B, cp + rbp, cp)).astype(np.float32)
    # make the diag block SPD
    for b in range(B):
        D = X[b, :cp, :cp]
        X[b, :cp, :cp] = D @ D.T + cp * np.eye(cp, dtype=np.float32)
    D0 = jnp.asarray(X[:, :cp, :])
    B0 = jnp.asarray(X[:, cp:, :])
    row = ""
    for route in ("blocked", "wide", "xla"):
        os.environ["SPFX_PANEL_KERNEL"] = route
        if route == "xla":
            os.environ["SPFX_NO_PALLAS"] = "1"

        def run(reps, D0, B0, route=route):
            def body(i, acc):
                dd, db = blocks._chol_deltas_blocks(
                    D0 + acc[0, 0, 0] * 1e-30, B0, w, nb, cp, rbp)
                return dd
            return lax.fori_loop(0, reps, body, jnp.zeros_like(D0))

        try:
            dt = slope(jax.jit(run, static_argnames=()), D0, B0)
            row += f"  {route}={dt*1e6:7.1f}us"
        except Exception as e:
            row += f"  {route}=FAIL({type(e).__name__})"
        os.environ.pop("SPFX_NO_PALLAS", None)
    os.environ.pop("SPFX_PANEL_KERNEL", None)
    print(f"B={B} cp={cp} rbp={rbp}:{row}", flush=True)
