#!/usr/bin/env python
"""A/B: fused level-chunk sizes vs unfused dispatch on the real chip.

Run when the chip/tunnel is healthy (see tools/chip_probe.py). Interleaved
reps control for drift; relative ordering is the signal.
"""
import time
import sys
import numpy as np
import jax

from spfx.io import generate
from spfx.chol.factorize import Cholesky
from spfx.utils.config import Config

grid = int(sys.argv[1]) if len(sys.argv) > 1 else 32
A = generate.laplacian_3d(grid)
variants = [("unfused", Config(dtype="float32", ordering="nd")),
            ("fused24", Config(dtype="float32", ordering="nd", fused=True,
                               calls_per_chunk=24)),
            ("fused96", Config(dtype="float32", ordering="nd", fused=True,
                               calls_per_chunk=96)),
            ("fused384", Config(dtype="float32", ordering="nd", fused=True,
                                calls_per_chunk=384))]
ctxs = [(name, Cholesky(A, cfg)) for name, cfg in variants]
nc = sum(len(lp.panels) + len(lp.updates) for lp in ctxs[0][1].plan.levels)
print(f"grid={grid} calls={nc} flops={ctxs[0][1].plan.flops:.2e}", flush=True)
for name, ctx in ctxs:
    t0 = time.perf_counter()
    f = ctx.factorize(A); _ = float(f.L[0])
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
for r in range(4):
    for name, ctx in ctxs:
        t0 = time.perf_counter()
        f = ctx.factorize(A); _ = float(f.L[0])
        dt = time.perf_counter() - t0
        print(f"rep{r} {name}: {dt:.3f}s {ctx.plan.flops/dt/1e9:.1f} GF/s",
              flush=True)
