"""A/B mega-engine configs on the real chip (slope protocol, shared process).
Usage: python tools/cfg_ab.py [grid]
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spfx.io import generate
from spfx.utils.config import Config
from spfx.chol.factorize import Cholesky
from spfx.kernels.mega import MegaRunner

def sync(x): return float(np.asarray(jnp.sum(x)))

grid = int(sys.argv[1]) if len(sys.argv) > 1 else 48
A = generate.laplacian_3d(grid)

VARIANTS = [
    ("base32", dict(class_min=32)),
    ("sn128-t64", dict(max_sn_cols=128, relax_width=(32, 64, 128),
                       relax_fill=(1.0, 0.8, 0.5), class_min=128,
                       update_tile=64, update_small=64)),
    ("sn128-cm32", dict(max_sn_cols=128, relax_width=(32, 64, 128),
                        relax_fill=(1.0, 0.8, 0.5), class_min=32)),
    ("sn256-cm64", dict(class_min=64)),
    ("bf2x", dict(class_min=32, batch_floor_elems=1 << 18)),
    ("bf4x", dict(class_min=32, batch_floor_elems=1 << 19,
                  max_gather_elems=1 << 26)),
]
if os.environ.get("SPFX_AB_ONLY"):
    keep = os.environ["SPFX_AB_ONLY"].split(",")
    VARIANTS = [v for v in VARIANTS if v[0] in keep]

for name, kw in VARIANTS:
    cfg = Config(dtype="float32", ordering="nd", matmul_precision="highest",
                 engine="mega", **kw)
    t0 = time.time()
    ctx = Cholesky(A, cfg)
    r = MegaRunner(ctx.plan, lu=False, config=cfg)
    (vals,) = ctx.entry_values(A)
    nst = len(np.asarray(r._steps[0]))
    print(f"{name}: plan {time.time()-t0:.0f}s steps={nst} "
          f"classes={len(r._kinds)} flops={ctx.plan.flops:.3e}", flush=True)
    t0 = time.time()
    sync(r.run_repeat(1, vals))
    print(f"{name}: compile+first {time.time()-t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(4):
        t = {}
        for reps in (1, 3):
            t0 = time.perf_counter()
            sync(r.run_repeat(reps, vals))
            t[reps] = time.perf_counter() - t0
        best = min(best, (t[3] - t[1]) / 2)
    print(f"{name}: {best:.3f}s/factorize = "
          f"{ctx.plan.flops/best/1e9:.1f} GF/s ({4.04e10/best/1e9:.1f} on base flops)",
          flush=True)
