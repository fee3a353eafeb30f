"""Kind-level attribution at grid=48 with ZERO extra compiles: the mega
program takes (cls_ids, chunk_ids) as traced args, so timed variants swap
step subsets for a known-cheap step."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax, jax.numpy as jnp

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from spfx.io import generate
from spfx.utils.config import Config
from spfx.chol.factorize import Cholesky
from spfx.kernels.mega import MegaRunner

def sync(x): return float(np.asarray(jnp.sum(x)))

G = int(os.environ.get("G", "48"))
A = generate.laplacian_3d(G)
cfg = Config(dtype="float32", ordering="nd", engine="mega",
             matmul_precision="highest")
ctx = Cholesky(A, cfg)
r = MegaRunner(ctx.plan, lu=False, config=cfg)
(vals,) = ctx.entry_values(A)
cls_ids = np.asarray(r._steps[0]); chunk_ids = np.asarray(r._steps[1])
kinds = [k for k, s in r._kinds]
statics = [s for k, s in r._kinds]
print(f"steps={len(cls_ids)} classes={len(kinds)}", flush=True)

# cheapest step: smallest UC class (by mp*kp + srows*csp), chunk 0
costs = []
for c, (k, s) in enumerate(zip(kinds, statics)):
    if k in ("UC", "UT"):
        mp, kp, csp, srows = s
        costs.append((mp * kp + srows * csp, c))
cheap = min(costs)[1]
print("cheap class:", cheap, kinds[cheap], statics[cheap], flush=True)

def timed(cls, chk, label, lo=1, hi=2, best_of=1):
    try:
        ci = jnp.asarray(cls.astype(np.int32))
        ch = jnp.asarray(chk.astype(np.int32))
        sync(r._run_rep(jnp.int32(1), vals, r._asm, ci, ch, *r._flat))
        best = 1e9
        for _ in range(best_of):
            t = {}
            for reps in (lo, hi):
                t0 = time.perf_counter()
                sync(r._run_rep(jnp.int32(reps), vals, r._asm, ci, ch,
                                *r._flat))
                t[reps] = time.perf_counter() - t0
            best = min(best, (t[hi] - t[lo]) / (hi - lo))
        print(f"{label}: {best*1e3:.0f} ms", flush=True)
        return best
    except Exception as e:
        print(f"{label}: FAILED {e!r}", flush=True)
        return float('nan')

full = timed(cls_ids, chunk_ids, "full")
allcheap = np.full_like(cls_ids, cheap)
zeros = np.zeros_like(chunk_ids)
base = timed(allcheap, zeros, "floor (all cheap)")

is_pc = np.asarray([kinds[c] == "PC" for c in cls_ids])
cls_uc = np.where(is_pc, cheap, cls_ids); chk_uc = np.where(is_pc, 0, chunk_ids)
t_uc = timed(cls_uc, chk_uc, "UPD only (PC->cheap)")
cls_pc = np.where(~is_pc, cheap, cls_ids); chk_pc = np.where(~is_pc, 0, chunk_ids)
t_pc = timed(cls_pc, chk_pc, "PC only (UPD->cheap)")
print(f"PC total ~ {1e3*(full-t_uc):.0f} ms; UC total ~ {1e3*(full-t_pc):.0f} ms; floor {1e3*base:.0f} ms", flush=True)

# split UC by csp
for csp_sel in (64, 128, 256):
    sel = np.asarray([kinds[c] in ("UC", "UT") and statics[c][2] == csp_sel
                      for c in cls_ids])
    cls_v = np.where(sel, cls_ids, np.where(is_pc | True, cheap, cls_ids))
    cls_v = np.where(sel, cls_ids, cheap)
    chk_v = np.where(sel, chunk_ids, 0)
    t = timed(cls_v, chk_v, f"UPD csp={csp_sel} only")
