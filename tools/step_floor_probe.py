"""Decompose the mega-scan per-step floor (~168us measured via attr_kinds):
scan of NSTEP identical steps, each variant adds one component of the cheap
UT branch. All on a 256MB factor buffer.

  v0: scan body = carry passthrough + tiny dus        (scan floor)
  v1: + 3.15MB region slice + dus                     (region cost)
  v2: v1 + one dma_gather(B=128, win=2048)            (one pallas call)
  v3: v1 + two dma_gathers (G:2048, H:1024)           (two pallas calls)
  v4: v3 + 11 packed-table dynamic slices             (table reads)
  v5: v4 + masks + 2 einsums + onehot (cheap UT math) (the full step)
  v6: v5 but ONE fused-table slice (chunk-major)      (the packing fix)
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from spfx.kernels.pallas_blocks import dma_gather

STORAGE = 64 * 1024 * 1024
NSTEP = 1000
SMAX = 786432              # 3.15MB as in the 48^3 plan
B, MP, KP, CSP, NP = 128, 32, 32, 32, 16
ROWS_G = MP + 1024 // KP   # 64
WING, WINH = ROWS_G * KP, max(NP * KP, 1024)

def sync(x): return float(np.asarray(jnp.sum(x)))

def slope(fn, *args, lo=1, hi=3, best_of=3):
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
offs = jnp.asarray((rng.integers(0, (STORAGE - SMAX) // 1024, NSTEP) * 1024).astype(np.int32))
starts = jnp.asarray((rng.integers(0, (STORAGE - WING) // 1024, (NSTEP, B)) * 1024).astype(np.int32))
# packed tables: 11 tables, total rowsize ~ 5*B + NP*B + misc
ROWSZ = [B, B, B, B, B, 1, 512, 8, 8*64, 1, B*NP]
TOT = sum(ROWSZ)
buf = jnp.asarray(rng.integers(0, 100, (NSTEP * TOT,), np.int32))

def build(variant):
    def body(L, xs):
        off, st, step = xs
        reg = None
        if variant >= 1:
            reg = lax.dynamic_slice(L, (off,), (SMAX,))
        acc = jnp.float32(0)
        G = H = None
        if variant >= 2:
            G = dma_gather(L, st, WING).reshape(B, ROWS_G, KP)
        if variant >= 3:
            H = dma_gather(L, st, WINH)[:, :NP * KP].reshape(B, NP, KP)
        tabs = []
        if variant == 4 or variant == 5:
            base = step * TOT
            o = 0
            for rs in ROWSZ:
                tabs.append(lax.dynamic_slice(buf, (base + o,), (rs,)))
                o += rs
        elif variant >= 6:
            row = lax.dynamic_slice(buf, (step * TOT,), (TOT,))
            o = 0
            for rs in ROWSZ:
                tabs.append(lax.slice_in_dim(row, o, o + rs))
                o += rs
        if variant >= 4:
            for t in tabs:
                acc = acc + t[0].astype(jnp.float32) * 1e-30
        if variant >= 5:
            kw = tabs[0] % KP; mr = tabs[1] % MP; rs_ = tabs[2] % 32
            cpos = (tabs[10] % CSP).reshape(B, NP)
            km = (jnp.arange(KP)[None, :] < kw[:, None]).astype(jnp.float32)
            rm = ((jnp.arange(ROWS_G)[None, :] >= rs_[:, None])
                  & (jnp.arange(ROWS_G)[None, :] < (rs_ + mr)[:, None])).astype(jnp.float32)
            Gm = G * rm[:, :, None]
            Hm = H * km[:, None, :]
            C = jnp.einsum("bmk,bnk->bmn", Gm, Hm, preferred_element_type=jnp.float32)
            oh = (cpos[:, :, None] == jnp.arange(CSP)[None, None, :]).astype(jnp.float32)
            E = jnp.einsum("bmn,bnc->bmc", C, oh, preferred_element_type=jnp.float32)
            acc = acc + jnp.sum(E) * 1e-30
        elif variant >= 2:
            acc = acc + jnp.sum(G) * 1e-30
            if variant >= 3:
                acc = acc + jnp.sum(H) * 1e-30
        if variant >= 1:
            return lax.dynamic_update_slice(L, reg + acc, (off,)), None
        return lax.dynamic_update_slice(
            L, (L[:8] + acc).reshape(8), (off,)), None

    def once(L):
        L, _ = lax.scan(body, L, (offs, starts, jnp.arange(NSTEP, dtype=jnp.int32)))
        return L

    @jax.jit
    def run(reps, L0):
        return lax.fori_loop(0, reps, lambda r, L: once(L + jnp.float32(1e-30) * r), L0)
    return run

L0 = jnp.zeros((STORAGE,), jnp.float32)
names = ["v0 scan+tiny dus", "v1 +3.15MB region", "v2 +1 dma_gather",
         "v3 +2 dma_gathers", "v4 +11 table slices", "v5 +masks/einsums (full)",
         "v6 full, 1 fused table slice"]
for v in range(7):
    t0 = time.time()
    try:
        run = build(v)
        dt = slope(run, L0)
        print(f"{names[v]:>30}: {dt/NSTEP*1e6:7.1f} us/step  ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{names[v]:>30}: FAILED {type(e).__name__} {str(e)[:120]}", flush=True)

# ---- extended variants: extend-add groups and switch width ----
from spfx.kernels import blocks as BL

EA_G2, W2 = 512, 1024
NG = 3
ea_rbase = jnp.asarray((rng.integers(0, (SMAX // CSP - W2) // 8, (NSTEP, 8)) * 1).astype(np.int32))
ea_rel = jnp.asarray(rng.integers(0, W2, (NSTEP, 8, EA_G2), np.int32))
ea_idx = jnp.asarray(rng.integers(0, B * ROWS_G, (NSTEP, 8 * EA_G2), np.int32))

def build_ea(nswitch=0):
    def step_body(L, off, st, step, erb, erl, eai):
        G = dma_gather(L, st, WING).reshape(B, ROWS_G, KP)
        H = dma_gather(L, st, WINH)[:, :NP * KP].reshape(B, NP, KP)
        row = lax.dynamic_slice(buf, (step * TOT, ), (TOT,))
        kw = row[:B] % KP; mr = row[B:2*B] % MP; rs_ = row[2*B:3*B] % 32
        cpos = (row[TOT-B*NP:] % CSP).reshape(B, NP)
        km = (jnp.arange(KP)[None, :] < kw[:, None]).astype(jnp.float32)
        rm = ((jnp.arange(ROWS_G)[None, :] >= rs_[:, None])
              & (jnp.arange(ROWS_G)[None, :] < (rs_ + mr)[:, None])).astype(jnp.float32)
        C = jnp.einsum("bmk,bnk->bmn", G * rm[:, :, None], H * km[:, None, :],
                       preferred_element_type=jnp.float32)
        oh = (cpos[:, :, None] == jnp.arange(CSP)[None, None, :]).astype(jnp.float32)
        E = jnp.einsum("bmn,bnc->bmc", C, oh, preferred_element_type=jnp.float32)
        # extend-add: 3.15MB region, fori over NG groups with 512-row gather
        reg = lax.dynamic_slice(L, (off,), (SMAX,))
        slab = reg[:SMAX].reshape(SMAX // CSP, CSP)
        Ef = E.reshape(-1, CSP)
        iw = jnp.arange(W2, dtype=jnp.int32)
        def gbody(g, slab):
            rb = erb[g]
            rel = lax.dynamic_index_in_dim(erl, g, 0, keepdims=False)
            idx = lax.dynamic_slice(eai, (g * EA_G2,), (EA_G2,))
            ec = Ef[idx]
            ohg = (iw[:, None] == rel[None, :]).astype(jnp.float32)
            delta = jnp.einsum("wg,gc->wc", ohg, ec, precision=lax.Precision.HIGHEST)
            win = lax.dynamic_slice(slab, (rb, jnp.int32(0)), (W2, CSP))
            return lax.dynamic_update_slice(slab, win - delta, (rb, jnp.int32(0)))
        slab = lax.fori_loop(0, jnp.int32(NG), gbody, slab)
        return slab.reshape(-1), off

    def body(L, xs):
        off, st, step, erb, erl, eai, c = xs
        if nswitch:
            brs = [lambda L, off, st, step, erb, erl, eai:
                   step_body(L, off, st, step, erb, erl, eai)
                   for _ in range(nswitch)]
            reg, off = lax.switch(c % nswitch, brs, L, off, st, step, erb, erl, eai)
        else:
            reg, off = step_body(L, off, st, step, erb, erl, eai)
        return lax.dynamic_update_slice(L, reg, (off,)), None

    def once(L):
        L, _ = lax.scan(body, L, (offs, starts, jnp.arange(NSTEP, dtype=jnp.int32),
                                  ea_rbase, ea_rel, ea_idx,
                                  jnp.arange(NSTEP, dtype=jnp.int32)))
        return L

    @jax.jit
    def run(reps, L0):
        return lax.fori_loop(0, reps, lambda r, L: once(L + jnp.float32(1e-30) * r), L0)
    return run

for ns, name in [(0, "v7 full + EA groups (ng=3)"), (8, "v8 v7 in 8-branch switch")]:
    t0 = time.time()
    try:
        run = build_ea(ns)
        dt = slope(run, L0)
        print(f"{name:>30}: {dt/NSTEP*1e6:7.1f} us/step  ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:>30}: FAILED {type(e).__name__} {str(e)[:150]}", flush=True)

# ---- v9: 59-branch switch; v9b: 2-branch ----
for ns, name in [(2, "v9b v7 in 2-branch switch"), (59, "v9 v7 in 59-branch switch")]:
    t0 = time.time()
    try:
        run = build_ea(ns)
        dt = slope(run, L0)
        print(f"{name:>30}: {dt/NSTEP*1e6:7.1f} us/step  ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:>30}: FAILED {type(e).__name__} {str(e)[:150]}", flush=True)

# ---- v12: nested switch: cond(kind) -> switch over subset ----
def build_nested(n1, n2):
    def step_body(L, off, st, step, erb, erl, eai):
        # same body as build_ea's
        G = dma_gather(L, st, WING).reshape(B, ROWS_G, KP)
        H = dma_gather(L, st, WINH)[:, :NP * KP].reshape(B, NP, KP)
        row = lax.dynamic_slice(buf, (step * TOT, ), (TOT,))
        kw = row[:B] % KP; mr = row[B:2*B] % MP; rs_ = row[2*B:3*B] % 32
        cpos = (row[TOT-B*NP:] % CSP).reshape(B, NP)
        km = (jnp.arange(KP)[None, :] < kw[:, None]).astype(jnp.float32)
        rm = ((jnp.arange(ROWS_G)[None, :] >= rs_[:, None])
              & (jnp.arange(ROWS_G)[None, :] < (rs_ + mr)[:, None])).astype(jnp.float32)
        C = jnp.einsum("bmk,bnk->bmn", G * rm[:, :, None], H * km[:, None, :],
                       preferred_element_type=jnp.float32)
        oh = (cpos[:, :, None] == jnp.arange(CSP)[None, None, :]).astype(jnp.float32)
        E = jnp.einsum("bmn,bnc->bmc", C, oh, preferred_element_type=jnp.float32)
        reg = lax.dynamic_slice(L, (off,), (SMAX,))
        slab = reg[:SMAX].reshape(SMAX // CSP, CSP)
        Ef = E.reshape(-1, CSP)
        iw = jnp.arange(W2, dtype=jnp.int32)
        def gbody(g, slab):
            rb = erb[g]
            rel = lax.dynamic_index_in_dim(erl, g, 0, keepdims=False)
            idx = lax.dynamic_slice(eai, (g * EA_G2,), (EA_G2,))
            ec = Ef[idx]
            ohg = (iw[:, None] == rel[None, :]).astype(jnp.float32)
            delta = jnp.einsum("wg,gc->wc", ohg, ec, precision=lax.Precision.HIGHEST)
            win = lax.dynamic_slice(slab, (rb, jnp.int32(0)), (W2, CSP))
            return lax.dynamic_update_slice(slab, win - delta, (rb, jnp.int32(0)))
        slab = lax.fori_loop(0, jnp.int32(NG), gbody, slab)
        return slab.reshape(-1), off

    mkbr = lambda: (lambda L, off, st, step, erb, erl, eai:
                    step_body(L, off, st, step, erb, erl, eai))
    brs1 = [mkbr() for _ in range(n1)]
    brs2 = [mkbr() for _ in range(n2)]

    def body(L, xs):
        off, st, step, erb, erl, eai, c = xs
        def side1(L):
            return lax.switch(c % n1, brs1, L, off, st, step, erb, erl, eai)
        def side2(L):
            return lax.switch(c % n2, brs2, L, off, st, step, erb, erl, eai)
        reg, off2 = lax.cond(c % 2 == 0, side1, side2, L)
        return lax.dynamic_update_slice(L, reg, (off2,)), None

    def once(L):
        L, _ = lax.scan(body, L, (offs, starts, jnp.arange(NSTEP, dtype=jnp.int32),
                                  ea_rbase, ea_rel, ea_idx,
                                  jnp.arange(NSTEP, dtype=jnp.int32)))
        return L

    @jax.jit
    def run(reps, L0):
        return lax.fori_loop(0, reps, lambda r, L: once(L + jnp.float32(1e-30) * r), L0)
    return run

t0 = time.time()
try:
    run = build_nested(30, 29)
    dt = slope(run, L0)
    print(f"{'v12 cond(30/29 switches)':>30}: {dt/NSTEP*1e6:7.1f} us/step  ({time.time()-t0:.0f}s)", flush=True)
except Exception as e:
    print(f"v12: FAILED {type(e).__name__} {str(e)[:150]}", flush=True)
