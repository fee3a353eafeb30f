"""fk-engine viability: in-kernel cost per update TASK.
One aliased pallas kernel, fori over B tasks, each:
  - DMA G window (rows_g*kp flat) HBM->VMEM (double-buffered)
  - value reshape flat -> (rows_g, kp)
  - C = G @ H^T (MXU), E = C @ OH (MXU)
  - slab[rb:rb+SPAN] -= OH_rows @ E (MXU + dynamic-sublane VMEM rmw)
Slab DMA'd in/out once per call. Measures us/task at several (kp, B).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

STORAGE = 64 * 1024 * 1024

def sync(x): return float(np.asarray(jnp.sum(x)))

def build(B, mp, kp, csp, np_h, SPAN, srows):
    ext = 1024 // kp
    rows_g = mp + ext
    WING = rows_g * kp
    WINH = max(((np_h * kp + 1023) // 1024) * 1024, 1024)
    nslab = srows * csp

    def kernel(ss_ref, hs_ref, rb_ref, lo_ref, L_ref, out_ref,
               gbuf, hbuf, slab, sems, osem):
        # slab in
        lo = pl.multiple_of((lo_ref[0] // 1024) * 1024, 1024)
        din = pltpu.make_async_copy(L_ref.at[pl.ds(lo, nslab)],
                                   slab.at[pl.ds(0, nslab)], sems.at[2])
        din.start()

        def start_g(i, slot):
            s = pl.multiple_of((ss_ref[i] // 1024) * 1024, 1024)
            return pltpu.make_async_copy(
                L_ref.at[pl.ds(s, WING)],
                gbuf.at[pl.ds(slot * WING, WING)], sems.at[slot])

        def start_h(i, slot):
            s = pl.multiple_of((hs_ref[i] // 1024) * 1024, 1024)
            return pltpu.make_async_copy(
                L_ref.at[pl.ds(s, WINH)],
                hbuf.at[pl.ds(slot * WINH, WINH)], sems.at[3 + slot])

        start_g(0, 0).start()
        start_h(0, 0).start()
        din.wait()

        iw = lax.broadcasted_iota(jnp.int32, (SPAN, rows_g), 0)
        im = lax.broadcasted_iota(jnp.int32, (SPAN, rows_g), 1)

        def body(i, _):
            slot = i % 2
            start_g(i, slot).wait()
            start_h(i, slot).wait()

            @pl.when(i + 1 < B)
            def _():
                start_g(i + 1, 1 - slot).start()
                start_h(i + 1, 1 - slot).start()

            g = gbuf[pl.ds(slot * WING, WING)].reshape(rows_g, kp)
            h = hbuf[pl.ds(slot * WINH, np_h * kp)].reshape(np_h, kp)
            c = jax.lax.dot_general(g, h, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            # one-hot cols: pretend cpos = iota (cheap build, same shape)
            ohc = (lax.broadcasted_iota(jnp.int32, (np_h, csp), 0)
                   == lax.broadcasted_iota(jnp.int32, (np_h, csp), 1)
                   ).astype(jnp.float32)
            e = jax.lax.dot_general(c, ohc, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            # one-hot rows from synthetic rel = row index (identity-ish)
            ohr = (iw == im).astype(jnp.float32)
            delta = jax.lax.dot_general(ohr, e, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            rb = rb_ref[i]
            cur = slab[pl.ds(rb * csp, SPAN * csp)].reshape(SPAN, csp)
            slab[pl.ds(rb * csp, SPAN * csp)] = (cur - delta).reshape(-1)
            return 0

        lax.fori_loop(0, B, body, 0)
        dout = pltpu.make_async_copy(slab.at[pl.ds(0, nslab)],
                                     out_ref.at[pl.ds(lo, nslab)], sems.at[2])
        dout.start(); dout.wait()

    def call(L, ss, hs, rb, lo):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
            + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((STORAGE,), jnp.float32),
            input_output_aliases={4: 0},
            scratch_shapes=[pltpu.VMEM((2 * WING,), jnp.float32),
                            pltpu.VMEM((2 * WINH,), jnp.float32),
                            pltpu.VMEM((nslab,), jnp.float32),
                            pltpu.SemaphoreType.DMA((3,)),
                            pltpu.SemaphoreType.DMA((2,))],
        )(ss, hs, rb, lo, L)

    rng = np.random.default_rng(0)
    NSTEP = 200
    ss = jnp.asarray(rng.integers(0, (STORAGE - WING) // 1024, (NSTEP, B)) * 1024, jnp.int32)
    hs = jnp.asarray(rng.integers(0, (STORAGE - WINH) // 1024, (NSTEP, B)) * 1024, jnp.int32)
    rb = jnp.asarray(rng.integers(0, srows - SPAN, (NSTEP, B)), jnp.int32)
    lo = jnp.asarray((rng.integers(0, (STORAGE - nslab) // 1024, (NSTEP, 1)) * 1024), jnp.int32)

    @jax.jit
    def run(reps, L0):
        def once(L):
            def sbody(L, xs):
                s, h, r, o = xs
                return call(L, s, h, r, o), None
            L, _ = lax.scan(sbody, L, (ss, hs, rb, lo))
            return L
        return lax.fori_loop(0, reps, lambda r, L: once(L + jnp.float32(1e-30) * r), L0)
    return run, NSTEP

L0 = jnp.zeros((STORAGE,), jnp.float32)
for (B, mp, kp, csp, np_h, SPAN, srows) in [
        (128, 32, 32, 64, 32, 128, 4096),
        (64, 128, 64, 128, 32, 128, 4096),
        (32, 128, 128, 128, 64, 256, 3072)]:
    t0 = time.time()
    try:
        run, NSTEP = build(B, mp, kp, csp, np_h, SPAN, srows)
        sync(run(jnp.int32(1), L0))
        best = 1e9
        for _ in range(3):
            t = {}
            for r in (1, 3):
                ta = time.perf_counter()
                sync(run(jnp.int32(r), L0))
                t[r] = time.perf_counter() - ta
            best = min(best, (t[3] - t[1]) / 2)
        per_step = best / NSTEP
        print(f"B={B} mp={mp} kp={kp} csp={csp}: {per_step*1e6:7.1f} us/step "
              f"= {per_step/B*1e9:6.0f} ns/task  ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"B={B} mp={mp} kp={kp}: FAILED {type(e).__name__} {str(e)[:300]}", flush=True)
