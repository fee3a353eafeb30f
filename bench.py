#!/usr/bin/env python
"""spfx headline benchmark: supernodal sparse Cholesky numeric factorization
throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "GFLOP/s", "vs_baseline": ...}

vs_baseline is the fraction of the chip's *measured* dense-matmul f32
speed-of-light (same matmul precision as the solver), i.e. the
fraction-of-roofline number BASELINE.md tracks. The reference publishes no
numbers of its own (SURVEY.md §6), so roofline fraction is the baseline axis.

Measurement protocol (tunnel-proof): the chip is reached through a tunnel
whose per-dispatch round trip has been observed anywhere from 55us to 1.8s
depending on contention. Every timed quantity is therefore measured as a
SLOPE between two in-jit repetition counts of a single-dispatch program
(the mega engine runs the whole factorization as one lax.scan; rep count is
a traced scalar), which cancels all constant per-dispatch overhead exactly.
Single-shot wall latency is logged alongside for reference.

Knobs (env):
  SPFX_BENCH_GRID   3D grid edge (default 48 -> n=110592)
  SPFX_BENCH_KIND   chol | lu (default chol)
  SPFX_BENCH_REPS   slope repetition count (default 4)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(arr) -> float:
    """Force completion with a dependent host fetch of one element.

    block_until_ready() has been observed to return before compute completes
    on tunneled backends (axon), which silently turns wall-clock timing into
    enqueue timing; fetching a data-dependent element cannot lie."""
    return float(np.asarray(arr[tuple(0 for _ in arr.shape)]).real)


def sync_sum(arr) -> float:
    """Like sync() but data-dependent on EVERY element."""
    return float(np.asarray(jnp.sum(arr)).real)


def measure_roofline(dtype, precision) -> float:
    """Measured dense-matmul speed of light at the solver's precision,
    via the same two-point slope protocol (dynamic in-jit rep count)."""
    m = 4096
    a = jnp.ones((m, m), dtype=dtype)
    b = jnp.ones((m, m), dtype=dtype)

    @jax.jit
    def mm_rep(reps, a, b):
        return lax.fori_loop(
            0, reps, lambda i, x: jnp.dot(x, b, precision=precision), a)

    sync(mm_rep(jnp.int32(2), a, b))        # compile
    dt = float("inf")
    for _ in range(3):                      # best-of-3 (contention windows)
        t = {}
        for r in (4, 20):
            t0 = time.perf_counter()
            sync(mm_rep(jnp.int32(r), a, b))
            t[r] = time.perf_counter() - t0
        dt = min(dt, max(t[20] - t[4], 1e-9) / 16)
    return 2.0 * m**3 / dt / 1e9


def main():
    grid = int(os.environ.get("SPFX_BENCH_GRID", "48"))
    kind = os.environ.get("SPFX_BENCH_KIND", "chol")
    reps = int(os.environ.get("SPFX_BENCH_REPS", "4"))

    from spfx.io import generate
    from spfx.utils.config import Config
    from spfx.validate import synth_rhs, scaled_residual

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")
    config = Config(
        dtype="float32", ordering="nd", matmul_precision="highest",
        engine="mega",
        class_min=int(os.environ.get("SPFX_CLASS_MIN", "8")),
        update_precision=os.environ.get("SPFX_UPDATE_PRECISION") or None)

    A = generate.laplacian_3d(grid)
    n = A.shape[0]
    log(f"matrix: 3D Poisson {grid}^3, n={n}, nnz={A.nnz}")

    if kind == "lu":
        from spfx.lu.factorize import LU as Ctx
    else:
        from spfx.chol.factorize import Cholesky as Ctx
    ctx = Ctx(A, config)
    log(f"analyze {ctx.analyze_time:.2f}s plan {ctx.plan_time:.2f}s  "
        f"nsuper={ctx.sym.nsuper} levels={len(ctx.plan.levels)} "
        f"nnzL={ctx.sym.nnzL} flops={ctx.plan.flops:.3e} "
        f"storage={ctx.plan.storage * 4 / 1e6:.1f}MB")

    # warmup factorize (compiles the single-dispatch mega program)
    t0 = time.perf_counter()
    f = ctx.factorize(A)
    arr = f.L if kind == "chol" else f.Lx
    sync(arr)
    log(f"first factorize (compile+run): {time.perf_counter() - t0:.2f}s")

    # single-shot wall latency (1 dispatch + 1 fetch round trip)
    t0 = time.perf_counter()
    f = ctx.factorize(A)
    arr = f.L if kind == "chol" else f.Lx
    sync(arr)
    t_single = time.perf_counter() - t0
    log(f"single-shot factorize (dispatch+fetch): {t_single:.3f}s "
        f"({ctx.plan.flops / t_single / 1e9:.1f} GFLOP/s incl. round trip)")

    # slope timing: (reps+1 factorizations) - (1 factorization), in-jit.
    # The chip is multi-tenant and its effective throughput varies >50x
    # between contention windows (matmul roofline measured 0.2..37 TFLOP/s
    # across one session), so sample the slope several times across a
    # bounded window and keep the best (least-contended) sample.
    window = float(os.environ.get("SPFX_BENCH_WINDOW", "420"))
    vals = ctx.entry_values(A)
    runner = ctx._runner
    sync_sum(runner.run_repeat(1, *vals)[0] if kind == "lu"
             else runner.run_repeat(1, *vals))    # compile rep program

    def slope_once():
        t = {}
        for r in (1, 1 + reps):
            t0 = time.perf_counter()
            out = runner.run_repeat(r, *vals)
            sync_sum(out[0] if kind == "lu" else out)
            t[r] = time.perf_counter() - t0
        return max(t[1 + reps] - t[1], 1e-9) / reps

    t_start = time.perf_counter()
    dt = slope_once()
    log(f"slope sample 0: {dt:.3f}s/factorize")
    i = 0
    while time.perf_counter() - t_start < window:
        left = window - (time.perf_counter() - t_start)
        if left > 45:
            time.sleep(min(30.0, left - 15))
        i += 1
        d = slope_once()
        log(f"slope sample {i}: {d:.3f}s/factorize")
        dt = min(dt, d)
    gflops = ctx.plan.flops / dt / 1e9
    log(f"best slope per-factorize: {dt:.3f}s  {gflops:.1f} GFLOP/s (device)")

    # correctness gate (reference-style residual, :3262) + solve timing
    b = synth_rhs(A)
    x = f.solve(b)          # refined solve (host C++ backend by default)
    t0 = time.perf_counter()
    f.solve(b)
    log(f"refined solve: {time.perf_counter() - t0:.3f}s")
    res = scaled_residual(A, x, b)
    log(f"scaled residual: {res:.3e}")
    if not res < 1e-10:
        log("RESIDUAL GATE FAILED")

    roofline = measure_roofline(jnp.float32, config.matmul_precision)
    log(f"measured f32(highest) matmul roofline: {roofline:.0f} GFLOP/s")

    print(json.dumps({
        "metric": f"sparse_{kind}_factorize_gflops_3dpoisson{grid}",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / roofline, 4),
    }))


if __name__ == "__main__":
    main()
