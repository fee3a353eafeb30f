"""Fused multi-level execution: chunk consecutive schedule levels into single
jit programs to amortize per-call dispatch latency.

The per-bucket primitives in spfx.kernels.blocks are ~50-100us of device
work each; dispatching them individually costs about that much again in
host/tunnel latency, so a factorization with ~1-2k bucket calls is
dispatch-bound. Chunks of consecutive levels inline the same primitives into
one traced program (order preserved — levels inside a chunk still execute
sequentially), cutting dispatch count by ~CALLS_PER_CHUNK while keeping each
compiled graph moderate.

The reference hides the same latency with CUDA streams and busy-polled
events (Cholesky/Source/SparseFrame.c:2514-2523); here the compiler simply
sees more of the schedule at once.
"""

from __future__ import annotations

from functools import partial

import jax

from spfx.kernels import blocks

CALLS_PER_CHUNK = 24


def chunk_levels(levels, calls_per_chunk: int = CALLS_PER_CHUNK):
    """Greedily group consecutive levels into chunks of bounded call count."""
    chunks = []
    cur, calls = [], 0
    for lp in levels:
        c = len(lp.panels) + len(lp.updates)
        if cur and calls + c > calls_per_chunk:
            chunks.append(cur)
            cur, calls = [], 0
        cur.append(lp)
        calls += c
    if cur:
        chunks.append(cur)
    return chunks


def _chol_chunk_fn(spec):
    """spec: tuple of ('P',) / ('U', kp, csp) entries in execution order."""

    @partial(jax.jit, donate_argnums=0)
    def fn(L, *arrays):
        it = iter(arrays)
        for ent in spec:
            if ent[0] == "P":
                L = blocks.factor_panels_chol.__wrapped__(
                    L, next(it), next(it), next(it))
            else:
                L = blocks.apply_updates_sym.__wrapped__(
                    L, next(it), next(it), next(it), next(it),
                    kp=ent[1], csp=ent[2])
        return L

    return fn


def _lu_chunk_fn(spec):
    @partial(jax.jit, donate_argnums=(0, 1))
    def fn(Lx, Ux, *arrays):
        it = iter(arrays)
        for ent in spec:
            if ent[0] == "P":
                Lx, Ux = blocks.factor_panels_lu.__wrapped__(
                    Lx, Ux, next(it), next(it), next(it))
            else:
                Lx, Ux = blocks.apply_updates_lu.__wrapped__(
                    Lx, Ux, next(it), next(it), next(it), next(it),
                    kp=ent[1], csp=ent[2])
        return Lx, Ux

    return fn


class FusedRunner:
    """Caches chunked fused programs for one FactorPlan."""

    def __init__(self, plan, lu: bool = False,
                 calls_per_chunk: int = CALLS_PER_CHUNK):
        from spfx.plan.schedule import PanelBucketC
        if any(isinstance(pb, PanelBucketC)
               for lp in plan.levels for pb in lp.panels):
            raise ValueError(
                "engine='fused' supports only Config(layout='rowwin') plans")
        self.lu = lu
        self.chunks = []
        for levels in chunk_levels(plan.levels, calls_per_chunk):
            spec, args = [], []
            for lp in levels:
                for ub in lp.updates:
                    spec.append(("U", ub.kp, ub.csp))
                    args.extend(ub.dev())
                for pb in lp.panels:
                    d = pb.dev()
                    spec.append(("P",))
                    args.extend(d[:3])
            spec = tuple(spec)
            fn = _lu_chunk_fn(spec) if lu else _chol_chunk_fn(spec)
            self.chunks.append((fn, args))

    def run(self, *state):
        for fn, args in self.chunks:
            state = fn(*state, *args)
            if not self.lu:
                state = (state,)
        return state if self.lu else state[0]


def _solve_chunk_fn(kind: str):
    """kind in {'fwd','bwd','fwd_lu','bwd_lu'}."""
    prim = {"fwd": blocks.solve_fwd_level, "bwd": blocks.solve_bwd_level,
            "fwd_lu": blocks.solve_fwd_level_lu,
            "bwd_lu": blocks.solve_bwd_level_lu}[kind].__wrapped__

    def make(nbuckets):
        @partial(jax.jit, donate_argnums=1)
        def fn(F, x, *arrays):
            it = iter(arrays)
            for _ in range(nbuckets):
                x = prim(F, x, next(it), next(it), next(it), next(it),
                         next(it))
            return x

        return fn

    return make


class FusedSolver:
    """Chunked fused forward/backward level solves for one plan."""

    def __init__(self, plan, lu: bool = False,
                 calls_per_chunk: int = CALLS_PER_CHUNK):
        from spfx.plan.schedule import PanelBucketC
        if any(isinstance(pb, PanelBucketC)
               for lp in plan.levels for pb in lp.panels):
            raise ValueError(
                "engine='fused' supports only Config(layout='rowwin') plans")
        fwd = _solve_chunk_fn("fwd_lu" if lu else "fwd")
        bwd = _solve_chunk_fn("bwd_lu" if lu else "bwd")
        self.fwd_chunks = self._build(chunk_levels(plan.levels,
                                                   calls_per_chunk), fwd)
        self.bwd_chunks = self._build(
            chunk_levels(list(reversed(plan.levels)), calls_per_chunk), bwd)

    @staticmethod
    def _build(chunks, make):
        out = []
        for levels in chunks:
            args, nb = [], 0
            for lp in levels:
                for pb in lp.panels:
                    args.extend(pb.dev())
                    nb += 1
            out.append((make(nb), args))
        return out

    def forward(self, F, x):
        for fn, args in self.fwd_chunks:
            x = fn(F, x, *args)
        return x

    def backward(self, F, x):
        for fn, args in self.bwd_chunks:
            x = fn(F, x, *args)
        return x
