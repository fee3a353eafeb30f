"""Stage-wise timing of the UC update branch at real 48^3 shapes: which op
class actually burns the time (gather / GEMM / expand / extend-add / slab)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from spfx.io import generate
from spfx.utils.config import Config
from spfx.symbolic.analyze import analyze
from spfx.plan.schedule import build_plan, EA_G, ea_window
from spfx.kernels import blocks

def sync(x): return float(np.asarray(jnp.sum(x)))

def slope(fn, *args):
    sync(fn(jnp.int32(1), *args))
    t = {}
    for r in (1, 9):
        t0 = time.perf_counter()
        sync(fn(jnp.int32(r), *args))
        t[r] = time.perf_counter() - t0
    return (t[9] - t[1]) / 8

G = int(os.environ.get("G", "48"))
A = generate.laplacian_3d(G)
cfg = Config(dtype="float32", ordering="nd", engine="mega",
             matmul_precision="highest")
sym = analyze(A, cfg)
plan = build_plan(sym, A, cfg)

# hottest UC classes by count
import collections
byclass = collections.defaultdict(list)
for lp in plan.levels:
    for ub in lp.updates:
        byclass[(ub.mp, ub.kp, ub.csp, ub.slab_rows)].append(ub)
top = sorted(byclass.items(), key=lambda kv: -len(kv[1]))[:4]
L = jnp.zeros((plan.storage,), jnp.float32)

for (mp, kp, csp, srows), ubs in top:
    ub = max(ubs, key=lambda u: len(u.kw))
    B = len(ub.kw)
    kw, mr = jnp.asarray(ub.kw), jnp.asarray(ub.mrows)
    ss = jnp.asarray(ub.src_start)
    cpos = jnp.asarray(ub.tgt_cpos)
    eai = jnp.asarray(ub.ea_idx)
    erb = jnp.asarray(ub.ea_rbase)
    erl = jnp.asarray(ub.ea_rel)
    lo = jnp.asarray(ub.slab_lo)
    npd = ub.tgt_cpos.shape[1]
    ng = len(ub.ea_rbase)
    print(f"class mp={mp} kp={kp} csp={csp} srows={srows} "
          f"B={B} np={npd} ng={ng} x{len(ubs)} chunks", flush=True)

    def rep(fn):
        # dependence threads through the (tiny) start-index array, NOT the
        # 260MB factor (L + 0*acc materializes a full copy per iteration)
        @jax.jit
        def r(reps, L, ss):
            def body(i, acc):
                s2 = ss + (acc[0] * 0.0).astype(ss.dtype)
                return acc + fn(L, s2, i)
            return lax.fori_loop(0, reps, body, jnp.zeros((1,), jnp.float32))
        return r

    with jax.default_matmul_precision("highest"):
        g1 = rep(lambda L, s2, i: jnp.sum(
            blocks._task_gather(L, s2, mp, kp))[None])
        dt = slope(g1, L, ss)
        print(f"  gather:        {dt*1e6:8.0f} us", flush=True)

        def f2(L, s2, i):
            Gm = blocks._task_gather(L, s2, mp, kp)
            Gm = Gm * blocks._col_mask(kw, kp, L.dtype)[:, None, :] \
                * blocks._row_mask(mr, mp, L.dtype)[:, :, None]
            C = jnp.einsum("bmk,bnk->bmn", Gm, Gm[:, :npd, :],
                           preferred_element_type=L.dtype)
            return jnp.sum(C)[None]
        dt = slope(rep(f2), L, ss)
        print(f"  +syrk C:       {dt*1e6:8.0f} us", flush=True)

        def f3(L, s2, i):
            E = blocks.update_rows_sym_c(L, kw, mr, s2, cpos, mp, kp, csp)
            return jnp.sum(E)[None]
        dt = slope(rep(f3), L, ss)
        print(f"  +expand E:     {dt*1e6:8.0f} us", flush=True)

        def f4(L, s2, i):
            E = blocks.update_rows_sym_c(L, kw, mr, s2, cpos, mp, kp, csp)
            L2 = blocks.extend_add_slab(L, lo[0], eai, erb, erl, E,
                                        srows, csp)
            return L2[:1]
        dt = slope(rep(f4), L, ss)
        print(f"  +extend-add:   {dt*1e6:8.0f} us", flush=True)

        def f5(L, s2, i):
            slab = lax.dynamic_slice(L, (lo[0] + s2[0] * 0,),
                                     (srows * csp,))
            return slab[:1]
        dt = slope(rep(f5), L, ss)
        print(f"  slab slice:    {dt*1e6:8.0f} us", flush=True)
