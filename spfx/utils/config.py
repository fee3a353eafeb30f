"""Runtime configuration for spfx.

The reference keeps its entire configuration compile-time in
``Cholesky/Include/parameter.h`` (thread counts, GPU split, relaxation policy,
CPU/GPU dispatch thresholds, stream/buffer multiples).  spfx replaces that with
a runtime dataclass carrying the same knob families, re-interpreted for TPU:

- supernode relaxation policy   (ref: parameter.h:28-46 ``should_relax``)
- supernode size caps           (ref: devSlotSize cap in analyze_supernodal)
- bucketing / padding policy    (ref: node-score thresholds parameter.h:58-103,
  which triage update tasks by (n, m, k) — here they become padded shape
  buckets for batched TPU kernels)
- dtype policy                  (ref is double everywhere; TPU native compute
  is f32 with f64 iterative refinement on the solve)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    # ---- ordering -------------------------------------------------------
    # Fill-reducing ordering. The reference's active method is METIS nested
    # dissection (Cholesky/Source/SparseFrame.c:1935-1937); AMD/CAMD exist but
    # are commented out. spfx ships: "nd" (BFS-separator nested dissection),
    # "amd" (approximate minimum degree), "rcm", "identity", "auto".
    ordering: str = "auto"
    nd_leaf_size: int = 96          # subgraphs below this are ordered directly

    # ---- supernode formation (ref analyze_supernodal :1471-1625) --------
    max_sn_cols: int = 256          # hard cap on supernode width
    # Relaxed amalgamation thresholds: merge a child supernode into its parent
    # if merged width <= relax_width[i] and the fraction of explicit zeros
    # introduced stays below relax_fill[i] (ref should_relax parameter.h:28-46).
    # TPU-tuned: considerably more aggressive than CPU-era defaults —
    # explicit zeros ride the MXU for nearly free, while narrow supernodes
    # cost whole extra kernel launches and tiny matmuls.
    relax_width: Tuple[int, ...] = (32, 64, 128, 256)
    relax_fill: Tuple[float, ...] = (1.0, 0.8, 0.5, 0.3)

    # ---- bucketing / padding (ref node-score triage parameter.h:58-103) --
    pad_min: int = 8                # minimum padded dim (f32 sublane tile)
    pad_batch_min: int = 1          # minimum padded batch
    max_gather_elems: int = 1 << 25 # chunk batched updates above this many
                                    # gathered f32 elements (HBM working set)
    batch_floor_elems: int = 1 << 17  # round small shape classes up to at
    #                                   least this much work per kernel call.
    #                                   Only the per-CALL engines profit from
    #                                   a large floor (dispatch amortization);
    #                                   in the mega scan every padded dead
    #                                   task costs real gather/MXU work —
    #                                   2^20 measured 65% dead tasks and 5GB
    #                                   of gather traffic at 48^3
    class_granularity: str = "pow4"   # update shape-class padding: "pow4"
    #                                   (fewer classes -> fewer calls) or
    #                                   "pow2" (less padding waste)
    class_min: int = 32               # smallest shape class: 32 collapses
    #                                   the tiny-task classes (near-zero
    #                                   FLOPs, ~40% of all calls at 48^3)
    #                                   into one, trading dead padded lanes
    #                                   for dispatches (measured best r4)
    # ---- update tiling (round 5) ----------------------------------------
    # M-tiled update tasks: every descendant update task is cut into source
    # row tiles of at most ``update_tile`` rows (tasks with M <=
    # ``update_small`` form their own small class), so the update shape
    # class is (mp in {update_small, update_tile}, kp, csp) — the tall-M
    # pow4 ladder disappears. Measured at 48^3: (level x class) pairs drop
    # 1808 -> ~1030, which bounds the mega scan's step count (each step
    # pays ~10us base + 2 x smax region traffic regardless of work).
    # update_tile = 0 restores the round-4 pow4 M classes.
    update_tile: int = 128
    update_small: int = 32
    # Minimum storage stride (contig layout): padding every supernode panel
    # to at least this stride collapses the tiny source-stride (kp) classes
    # (kp=8 alone is ~22k tasks at 48^3) into one, cutting (level x class)
    # pairs ~1.4x for ~25% more storage.
    stride_min: int = 32
    # Row-count padding grain: below-row counts and slab heights are padded
    # to powers of two up to this grain, then to multiples of it. Caps the
    # pow2 overshoot on tall panels (a 2336-row panel pads to 2560, not
    # 4096), which sets the engine's global per-step region size smax.
    row_grain: int = 512
    # Memory layout of the windowed gathers/scatters:
    # - "contig" (default): panel storage stride == pow2-padded width, so a
    #   panel's diag block, its below block, and every update task's source
    #   rows are each ONE contiguous window — one transfer descriptor per
    #   task instead of one per row. Windowed gathers on TPU are descriptor-
    #   rate-bound (~75ns/descriptor measured), so per-row windows cap
    #   update/panel traffic at single-digit GB/s; per-task windows move
    #   whole blocks per descriptor.
    # - "rowwin": round-1 layout, one window per panel row (stride == true
    #   width, less padding memory).
    layout: str = "contig"
    stride_padding: bool = False      # (rowwin only) pad stride to the class
    #                                   grid (windows==stride)
    update_windowing: bool = False    # expand/scatter updates only over the
    #                                   [cmin, cmax] target-column span
    #                                   (smaller one-hot + 4x less scatter
    #                                   traffic, but more shape classes ->
    #                                   more calls); ignored if stride_padding
    max_pad_ratio: float = 0.0        # >0: cap each batch quantum at
    #                                   pad_pow2(ratio * class population),
    #                                   bounding dead padded work per call at
    #                                   the cost of extra jit signatures
    max_region_elems: int = 1 << 19   # cap on one scan step's writable
    #                                   storage region (panel bucket block /
    #                                   update slab). The mega engine's
    #                                   switch branches return their region
    #                                   instead of the whole factor (a
    #                                   read+write branch inside lax.switch
    #                                   measures a full-carry copy per step:
    #                                   679us vs 94us at 268MB storage /
    #                                   8MB regions on v5e). EVERY scan step
    #                                   pays the global max region's traffic
    #                                   (XLA requires uniform write sizes
    #                                   across switch branches — mixed sizes
    #                                   measured a 1.6ms full-carry copy per
    #                                   step, tools/switch_inplace.py), so
    #                                   this cap is a first-order throughput
    #                                   knob; the tallest single panel still
    #                                   floors the global smax above it

    # ---- numeric --------------------------------------------------------
    dtype: str = "float32"          # device compute dtype
    # TPU MXU f32 matmuls default to a single bf16 pass (~1e-3 accuracy);
    # direct solvers need "highest" (bf16x6) or "float32" for f32-grade
    # factors. Iterative refinement then recovers f64-grade solves.
    matmul_precision: str = "highest"
    # Precision for descendant-update GEMMs only (None -> matmul_precision).
    # The update products carry ~85% of the FLOPs; running them at "high"
    # (bf16x3) while panel factorization stays at matmul_precision halves
    # their MXU passes, and the f64 refinement sweeps absorb the extra
    # ~1e-6 relative error in the factor.
    update_precision: Optional[str] = None
    refine_iters: int = 3           # f64 iterative-refinement sweeps on solve
    refine_tol: float = 1e-12       # stop refinement below this scaled resid
    # Static pivoting (LU only): compute a greedy max-magnitude row matching
    # on the host and factor the row-permuted matrix. The reference ships
    # this routine disabled (LU/Source/SparseFrame.c:589-673, call #if 0'd
    # at :784-787); here it is an opt-in preprocessing step for matrices
    # that are not diagonally dominant.
    static_pivot: bool = False
    # Solve backend: "host" runs the native C++ supernodal solve in f64 on
    # the copied-back factor (single-RHS latency path, no device compiles);
    # "device" runs the level-batched TPU solves (many-RHS throughput path);
    # "auto" picks host when the native library and a real dtype are present.
    solve_backend: str = "auto"

    # ---- execution ------------------------------------------------------
    # Numeric engine:
    # - "mega"  (default): the ENTIRE schedule is one jitted lax.scan over a
    #   step table with lax.switch over shape classes — exactly ONE
    #   host->device dispatch per factorize and O(#shape classes) compiled
    #   code, so throughput is independent of host/tunnel round-trip latency
    #   (measured 55us..1.8s per dispatch depending on link contention) and
    #   the factor array stays in place as the scan carry.
    # - "calls": one donated jit call per bucket (round-1 path; useful for
    #   debugging and per-bucket profiling).
    # - "fused": chunks of calls_per_chunk buckets per jit program. Measured
    #   ~3-5x slower than "calls" on TPU (the unrolled graph's overlapping
    #   live ranges force XLA to materialize factor copies) — kept for
    #   comparison only.
    engine: str = "mega"
    fused: bool = False             # deprecated alias: True -> engine="fused"
    calls_per_chunk: int = 24       # bucket calls per fused chunk

    # ---- misc -----------------------------------------------------------
    # Run the reference-style scaled-residual check right after factorize
    # (ref SparseFrame_validate :3141-3266); stored as factor.residual.
    validate: bool = False
    # Per-phase wall timers printed to stderr (ref info.h:146-149, report at
    # :3427-3434); with SPFX_PROFILE_DIR set, also captures a jax.profiler
    # device trace around factorize (ref cudaProfilerStart/Stop :3411-3415).
    profile: bool = False


DEFAULT = Config()


def pad_pow2(x: int, lo: int = 8) -> int:
    """Round ``x`` up to a power of two, at least ``lo``."""
    if x <= lo:
        return lo
    p = 1 << (int(x - 1).bit_length())
    return p
