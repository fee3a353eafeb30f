#!/usr/bin/env python
"""Quick chip-health probe: one random-data matmul + dispatch floor.

Healthy reference (recorded 2026-08-17): ~17.5 TF/s f32(highest) on the
4096 matmul, dispatch floor ~55-64us. Readings far below mean the tunnel /
chip is contended -- don't trust absolute bench numbers in that window.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
m = 4096
a = jnp.asarray(rng.standard_normal((m, m)), jnp.float32)
b = jnp.asarray(rng.standard_normal((m, m)), jnp.float32)
mm = jax.jit(lambda a, b: jnp.dot(a, b, precision="highest"))
_ = float(mm(a, b)[0, 0])
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    _ = float(mm(a, b)[0, 0])
    ts.append(time.perf_counter() - t0)
best = min(ts)
print(f"matmul4096 f32(highest): best {2*m**3/best/1e12:.1f} TF/s "
      f"(median {2*m**3/sorted(ts)[2]/1e12:.1f})")
sm = jax.jit(lambda x: x + 1.0)
x = jnp.ones((8, 8), jnp.float32)
_ = float(sm(x)[0, 0])
t0 = time.perf_counter()
for _ in range(200):
    x = sm(x)
_ = float(x[0, 0])
print(f"dispatch floor: {(time.perf_counter()-t0)/200*1e6:.0f} us/call")
