"""iALS training benchmark: examples/s + retrieval quality.

Per BASELINE.json: iALS on MovieLens-20M matching reference recall@20 /
NDCG@10 with >=85% examples/s scaling from 1 to N hosts. This environment
has no network access and one TPU chip, so the harness:
- loads real MovieLens files if SPFX_ML_PATH points at one (u.data /
  ratings.csv), else generates ML-100K-scale synthetic interactions with
  planted low-rank structure;
- reports sustained examples/s over full ALS iterations and recall@20 /
  NDCG@10 on a leave-5-out split;
- optionally measures mesh scaling (examples/s on 1 device vs all devices)
  when more than one device is available.

Run: python -m spfx.bench.als_bench
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import jax

from spfx.dist.mesh import make_mesh
from spfx.recsys import data as rdata
from spfx.recsys.als import ALSModel, ALSConfig


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(scale: str = "100k", iters: int = 8, mesh=None) -> dict:
    path = os.environ.get("SPFX_ML_PATH")
    if path and os.path.exists(path):
        inter = rdata.load_movielens(path)
        log(f"loaded {path}: {inter.num_users} users {inter.num_items} items "
            f"{inter.nnz} interactions")
    else:
        cache = f"/tmp/spfx_als_{scale}.npz"
        if os.path.exists(cache):
            z = np.load(cache)
            inter = rdata.Interactions(int(z["nu"]), int(z["ni"]),
                                       z["u"], z["i"], z["r"])
        else:
            if scale == "20m":
                inter = rdata.synthetic(138000, 27000, avg_degree=144,
                                        rank=16, seed=0)
            else:
                inter = rdata.synthetic(943, 1682, avg_degree=106, rank=12,
                                        seed=0)
            np.savez(cache, nu=inter.num_users, ni=inter.num_items,
                     u=inter.user_ids, i=inter.item_ids, r=inter.ratings)
        log(f"synthetic {scale}: {inter.num_users} users {inter.num_items} "
            f"items {inter.nnz} interactions")
    train, test = inter.split(holdout=5, seed=1)
    cfg = ALSConfig(rank=64, lam=0.3, alpha=10.0, user_cap=256, item_cap=512,
                    chunk=512, dtype="float32")
    m = ALSModel(train, cfg, mesh=mesh)
    # slope timing: (1 + iters) - (1) iterations, each inside one jitted
    # program (traced count) -> cancels dispatch/sync round trips exactly
    m.fit_steps(1)                     # compile + warm
    jax.block_until_ready((m.U, m.V))
    np.asarray(m.V[:1, :1])
    t = {}
    for r in (1, 1 + iters):
        t0 = time.perf_counter()
        m.fit_steps(r)
        jax.block_until_ready((m.U, m.V))
        np.asarray(m.V[:1, :1])
        t[r] = time.perf_counter() - t0
        log(f"fit_steps({r}): {t[r]:.3f}s")
    per_iter = max(t[1 + iters] - t[1], 1e-9) / iters
    steady = [train.nnz * 2 / per_iter]
    log(f"slope per-iteration: {per_iter:.3f}s  {steady[0]:,.0f} examples/s")
    metrics = m.evaluate(test)
    out = {
        "examples_per_sec": float(np.median(steady)),
        **{k: v for k, v in metrics.items()},
        "nnz": train.nnz,
        "devices": len(jax.devices()) if mesh is None else mesh.devices.size,
    }
    log(json.dumps(out))
    return out


def scaling() -> dict:
    """examples/s on a 1-device mesh vs the full mesh (same problem)."""
    devs = jax.devices()
    one = run(mesh=make_mesh(devices=devs[:1]), iters=4)
    if len(devs) == 1:
        return {"scaling_efficiency": 1.0, "single": one}
    full = run(mesh=make_mesh(devices=devs), iters=4)
    eff = full["examples_per_sec"] / (one["examples_per_sec"] * len(devs))
    out = {"scaling_efficiency": eff, "single": one, "full": full}
    log(json.dumps({"scaling_efficiency": eff}))
    return out


if __name__ == "__main__":
    run(scale=os.environ.get("SPFX_ALS_SCALE", "100k"))
    if len(jax.devices()) > 1:
        scaling()
