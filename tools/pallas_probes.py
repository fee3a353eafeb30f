#!/usr/bin/env python
"""Feasibility probes for the supernodal megakernel's Pallas plumbing.

P1: dynamic scalar read from a VMEM int32 ref used as a DMA start.
P2: DMA HBM->VMEM with dynamic start inside fori_loop, aliased writeback.
P3: lax.switch between branches of different static compute shapes.
P4: overlap-tail write trick (last chunk re-covers the end exactly).
P5: slab-DMA throughput (DMAs/sec at supernodal sizes).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = jax.default_backend() != "tpu"


def p1_p2_kernel(desc_ref, hbm_ref, out_ref, vbuf, sem):
    # desc holds [start0, start1, n] as int32 in SMEM (dynamic scalar reads
    # must come from SMEM: a VMEM vector.load of 1 element fails to compile)
    n = desc_ref[2]

    def body(i, _):
        start = desc_ref[i]                      # dynamic scalar from VMEM
        dma = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(start, 128)], vbuf.at[pl.ds(0, 128)], sem)
        dma.start()
        dma.wait()
        v = vbuf[pl.ds(0, 128)]
        dma2 = pltpu.make_async_copy(vbuf.at[pl.ds(0, 128)],
                                     out_ref.at[pl.ds(i * 128, 128)], sem)
        vbuf[pl.ds(0, 128)] = v * 2.0
        dma2.start()
        dma2.wait()
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def probe12():
    x = jnp.arange(4096, dtype=jnp.float32)
    desc = jnp.asarray([512, 2048, 2], jnp.int32)
    out = pl.pallas_call(
        p1_p2_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((256,), jnp.float32),
        scratch_shapes=[pltpu.VMEM((128,), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=INTERPRET,
    )(desc, x)
    got = np.asarray(out)
    want = np.concatenate([np.arange(512, 640), np.arange(2048, 2176)]) * 2.0
    ok = np.allclose(got, want)
    print(f"P1/P2 dynamic-scalar DMA: {'OK' if ok else 'FAIL'}")
    if not ok:
        print("  got", got[:8], "want", want[:8])


def p3_kernel(cls_ref, in_ref, out_ref):
    c = cls_ref[0]

    def b0():
        v = in_ref[pl.ds(0, 64)].reshape(8, 8)
        out_ref[pl.ds(0, 64)] = (v @ v).reshape(-1)

    def b1():
        v = in_ref[pl.ds(0, 256)].reshape(16, 16)
        out_ref[pl.ds(0, 256)] = (v @ v).reshape(-1)

    jax.lax.switch(c, [b0, b1])


def probe3():
    x = jnp.arange(256, dtype=jnp.float32) / 256.0
    outs = []
    for cid in (0, 1):
        out = pl.pallas_call(
            p3_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256,), jnp.float32),
            interpret=INTERPRET,
        )(jnp.asarray([cid], jnp.int32), x)
        outs.append(np.asarray(out))
    a = np.asarray(x[:64]).reshape(8, 8)
    b = np.asarray(x).reshape(16, 16)
    ok0 = np.allclose(outs[0][:64], (a @ a).reshape(-1), atol=1e-5)
    ok1 = np.allclose(outs[1], (b @ b).reshape(-1), atol=1e-5)
    print(f"P3 switch static-shape branches: {'OK' if ok0 and ok1 else 'FAIL'}")


def p4_kernel(n_ref, in_ref, out_ref, vbuf, sem):
    # copy n floats from in to out in 128-chunks; last chunk overlaps back
    n = n_ref[0]
    nfull = n // 128

    def body(i, _):
        d = pltpu.make_async_copy(in_ref.at[pl.ds(i * 128, 128)],
                                  vbuf.at[pl.ds(0, 128)], sem)
        d.start(); d.wait()
        d2 = pltpu.make_async_copy(vbuf.at[pl.ds(0, 128)],
                                   out_ref.at[pl.ds(i * 128, 128)], sem)
        d2.start(); d2.wait()
        return 0

    jax.lax.fori_loop(0, nfull, body, 0)

    @pl.when(nfull * 128 < n)
    def _():
        start = n - 128
        d = pltpu.make_async_copy(in_ref.at[pl.ds(start, 128)],
                                  vbuf.at[pl.ds(0, 128)], sem)
        d.start(); d.wait()
        d2 = pltpu.make_async_copy(vbuf.at[pl.ds(0, 128)],
                                   out_ref.at[pl.ds(start, 128)], sem)
        d2.start(); d2.wait()


def probe4():
    x = jnp.arange(1024, dtype=jnp.float32)
    n = 700
    out = pl.pallas_call(
        p4_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((1024,), jnp.float32),
        scratch_shapes=[pltpu.VMEM((128,), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=INTERPRET,
    )(jnp.asarray([n], jnp.int32), x)
    got = np.asarray(out)
    ok = np.allclose(got[:n], np.arange(n))
    print(f"P4 overlap-tail copy: {'OK' if ok else 'FAIL'}")


def p5_kernel(starts_ref, hbm_ref, out_ref, vbuf, sem):
    nt = starts_ref.shape[0]

    def body(i, acc):
        start = starts_ref[i]
        d = pltpu.make_async_copy(hbm_ref.at[pl.ds(start, 4096)],
                                  vbuf.at[pl.ds(0, 4096)], sem)
        d.start(); d.wait()
        return acc + jnp.sum(vbuf[pl.ds(0, 4096)])

    acc = jax.lax.fori_loop(0, nt, body, jnp.float32(0))
    out_ref[0] = acc


def probe5():
    rng = np.random.default_rng(0)
    storage = 30_000_000
    L = jnp.asarray(rng.standard_normal(storage).astype(np.float32))
    ntask = 4096
    starts = jnp.asarray(
        rng.integers(0, storage - 4096, ntask).astype(np.int32))
    f = pl.pallas_call(
        p5_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4096,), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=INTERPRET,
    )
    out = f(starts, L)
    _ = float(out[0])
    t0 = time.perf_counter()
    out = f(starts, L)
    _ = float(out[0])
    dt = time.perf_counter() - t0
    print(f"P5 slab DMA: {ntask} x 16KB serial DMAs in {dt*1e3:.1f} ms "
          f"-> {ntask/dt/1e3:.0f}k DMAs/s, {ntask*4096*4/dt/1e9:.1f} GB/s")


def p6_kernel(hbm_i_ref, out_ref, sdesc, sem):
    d = pltpu.make_async_copy(hbm_i_ref.at[pl.ds(128, 64)],
                              sdesc.at[pl.ds(0, 64)], sem)
    d.start(); d.wait()
    tot = jax.lax.fori_loop(0, 64, lambda i, a: a + sdesc[i], jnp.int32(0))
    out_ref[0] = tot


def probe6():
    xi = jnp.arange(1024, dtype=jnp.int32)
    out = pl.pallas_call(
        p6_kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((64,), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=INTERPRET,
    )(xi)
    ok = int(out[0]) == sum(range(128, 192))
    print(f"P6 HBM->SMEM desc DMA: {'OK' if ok else 'FAIL'} ({int(out[0])})")


def p7_kernel(tpos_ref, val_ref, out_ref):
    # one-hot row expansion from an int vector in VMEM (vector use, not
    # scalar use): rows = onehot(tpos) @ val
    t = tpos_ref[:]                       # (64,) int32 vector read is fine
    oh = (jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
          == t[None, :]).astype(jnp.float32)          # (128, 64)
    out_ref[:, :] = jax.lax.dot_general(
        oh, val_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def probe7():
    rng = np.random.default_rng(0)
    tpos = np.sort(rng.choice(128, 64, replace=False)).astype(np.int32)
    val = rng.standard_normal((64, 128)).astype(np.float32)
    out = pl.pallas_call(
        p7_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        interpret=INTERPRET,
    )(jnp.asarray(tpos), jnp.asarray(val))
    want = np.zeros((128, 128), np.float32)
    want[tpos] = val
    ok = np.allclose(np.asarray(out), want, atol=1e-6)
    print(f"P7 one-hot row scatter in VMEM: {'OK' if ok else 'FAIL'}")


if __name__ == "__main__":
    probe12()
    probe3()
    probe4()
    probe5()
    probe6()
    probe7()
