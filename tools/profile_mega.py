"""Attribute mega-engine device time to scan/switch overhead vs branch work.

Builds the Cholesky mega runner for a small Poisson grid, then times, via the
in-jit slope protocol (reps is traced; slope between two rep counts cancels
dispatch overhead):
  1. the full factorization (scan over all steps)
  2. a scan of the same length whose body is the raw switch with all branches
     replaced by identity (carry passthrough)  -> scan+switch overhead
  3. each class branch alone in a fori_loop    -> per-call branch cost
Prints a per-class cost table and the implied total.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def slope(fn, *args, lo=2, hi=10, best_of=3):
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


def main():
    grid = int(os.environ.get("G", "16"))
    from spfx.io import generate
    from spfx.utils.config import Config
    from spfx.chol.factorize import Cholesky

    A = generate.laplacian_3d(grid)
    ctx = Cholesky(A, Config(dtype="float32", ordering="nd", engine="mega",
                             matmul_precision="highest"))
    from spfx.kernels.mega import MegaRunner
    ctx._runner = MegaRunner(ctx.plan, lu=False, config=ctx.config)
    r = ctx._runner
    cls_ids, chunk_ids = (np.asarray(x) for x in r._steps)
    nsteps = len(cls_ids)
    print(f"grid={grid} n={A.shape[0]} steps={nsteps} "
          f"classes={len(r._kinds)} storage={r.storage}", flush=True)
    counts = np.bincount(cls_ids, minlength=len(r._kinds))
    for c, ((kind, static), cnt) in enumerate(zip(r._kinds, counts)):
        tabs = None
        print(f"  class {c}: kind={kind} static={static} steps={cnt}",
              flush=True)

    vals = ctx.entry_values(A)[0]

    # 1. full factorize slope
    dt_full = slope(lambda rr, v: r._run_rep(rr, v, r._asm, *r._steps,
                                             *r._flat), vals, lo=1, hi=5)
    print(f"full factorize: {dt_full*1e3:.1f} ms "
          f"({dt_full/nsteps*1e6:.0f} us/step)", flush=True)

    # 2. scan+switch with identity branches, same steps
    storage = r.storage
    nbr = len(r._kinds)
    ids = jnp.asarray(cls_ids)
    chs = jnp.asarray(chunk_ids)

    @jax.jit
    def ident_rep(reps, v):
        brs = [lambda L, i: L * 1.0 for _ in range(nbr)]

        def once(v):
            L = jnp.zeros((storage,), v.dtype).at[:v.shape[0]].set(v)

            def body(L, xs):
                c, i = xs
                return lax.switch(c, brs, L, i), None
            L, _ = lax.scan(body, L, (ids, chs))
            return L

        def body(i, Lp):
            return once(v + jnp.sum(Lp) * 0)
        return lax.fori_loop(0, reps, body,
                             jnp.zeros((storage,), v.dtype))

    dt_id = slope(ident_rep, vals, lo=1, hi=5)
    print(f"identity-branch scan: {dt_id*1e3:.1f} ms "
          f"({dt_id/nsteps*1e6:.0f} us/step)", flush=True)

    # 3. per-class: scan over that class's own steps only
    L0 = r.run(vals)
    sync(L0)
    total = 0.0
    for c in range(nbr):
        sel = np.nonzero(cls_ids == c)[0]
        mych = jnp.asarray(chunk_ids[sel])
        k = len(sel)
        dt_c = _time_class(r, c, mych, L0, k)
        total += dt_c * k
        print(f"  class {c} {r._kinds[c]}: {dt_c*1e6:.0f} us/call x {k} "
              f"= {dt_c*k*1e3:.1f} ms", flush=True)
    print(f"sum of per-class costs: {total*1e3:.1f} ms "
          f"(full was {dt_full*1e3:.1f} ms)", flush=True)


def _time_class(r, c, mych, L0, k):
    """Slope-time a scan running only class c's steps, real branch."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from spfx.kernels import mega as M

    layout = r._layout
    flat = r._flat
    kinds = r._kinds

    @jax.jit
    def rep(reps, L0, *flat):
        tabs_by_class = M._unflatten(layout, flat)
        # recreate branch c exactly as MegaRunner does
        from spfx.kernels import blocks

        def mk(kind, static, tabs):
            if kind == "U":
                kp, csp = static

                def br(L, i):
                    kw, srs, trs, cpos = M._take(tabs, i)
                    E = blocks.update_rows_sym(L, kw, srs, cpos, kp, csp)
                    return blocks._win_scatter_add(L, trs, -E)
            elif kind == "UC":
                mp, kp, csp, srows = static

                def br(L, i):
                    kw, mr, ss, lo, eai, erb, erl, cpos = M._take(tabs, i)
                    E = blocks.update_rows_sym_c(L, kw, mr, ss, cpos,
                                                 mp, kp, csp)
                    return blocks.extend_add_slab(L, lo[0], eai, erb, erl,
                                                  E, srows, csp)
            elif kind == "PC":
                cp, rbp = static

                def br(L, i):
                    w, nb, lo = M._take(tabs, i)
                    return blocks.factor_panels_chol_u(L, w, nb, lo[0],
                                                       cp, rbp)
            else:
                def br(L, i):
                    w, drs, brs_ = M._take(tabs, i)
                    dD, dB = blocks.panel_deltas_chol(L, w, drs, brs_)
                    L = blocks._win_scatter_add(L, drs, dD)
                    return blocks._win_scatter_add(L, brs_, dB)
            return br

        br = mk(*kinds[c], tabs_by_class[c])

        def once(L):
            def body(L, i):
                return br(L, i), None
            L, _ = lax.scan(body, L, mych)
            return L

        def body(j, L):
            return once(L0 + jnp.sum(L) * 0)
        return lax.fori_loop(0, reps, body, jnp.zeros_like(L0))

    with jax.default_matmul_precision("highest"):
        return slope(rep, L0, *flat, lo=1, hi=5) / k


if __name__ == "__main__":
    main()
