"""Single VMEM footprint model for every spfx Pallas kernel.

Mosaic stages each pallas_call block in VMEM with the f32 tile layout
T(8, 128): the last dim is padded to a multiple of 128 lanes and the
second-to-last to a multiple of 8 sublanes. A (128, 128, 16) f32 block
therefore occupies 128*128*128*4 = 8MB — 8x its nominal size. Every byte
budget in the kernels and the panel-kernel routing in spfx.kernels.blocks
must be computed on these PADDED bytes; round 3 shipped four scattered
nominal-byte heuristics instead, and the (cp=128, rbp=512, B=16) lanes
class blew the 64MB scoped-VMEM limit on real TPU (66.46M measured by
Mosaic) while every model said it was fine.

Model calibration: for that exact class this module predicts 67.4MB
(lanes_panel_bytes(128, 512, 16)) vs Mosaic's measured 66.46M — the one
hardware-measured OOM is reproduced, so the CAP_ROUTE margin below is
meaningful.

The reference's analogue of this file is its devSlotSize partitioning of
GPU memory (Cholesky/Source/SparseFrame.c:1721-1846): a single static
model of what fits, consulted by the scheduler. Here the resource is VMEM
and the consumers are pallas_call block specs.
"""

from __future__ import annotations

import os

LIMIT = 64 * 1024 * 1024      # vmem_limit_bytes passed to every pallas_call
CAP_ROUTE = 44 * 1024 * 1024  # routing: stay well clear of the scoped limit
CAP_HARD = 56 * 1024 * 1024   # trace-time assertion (catches routing bugs)

LANES_CP_MAX = 256            # lanes kernels cover panel widths up to this
WIDE_CP_MAX = 256             # wide kernels cover panel widths up to this
_LANE = 128


def pad8(x: int) -> int:
    return -(-int(x) // 8) * 8


def pad128(x: int) -> int:
    return -(-int(x) // 128) * 128


def tile_bytes(shape, itemsize: int = 4) -> int:
    """VMEM-resident bytes of one block: last dim padded to 128 lanes,
    second-to-last to 8 sublanes (leading dims unpadded)."""
    if not shape:
        return itemsize
    s = [int(d) for d in shape]
    s[-1] = pad128(s[-1])
    if len(s) >= 2:
        s[-2] = pad8(s[-2])
    n = 1
    for d in s:
        n *= max(d, 0)
    return n * itemsize


def lanes_slab(B: int) -> int:
    """Lane count per lanes-kernel grid step: largest pow2 <= min(B, 128).
    Mosaic pads the lane dim to 128 regardless, so slab < 128 wastes
    128/slab of the block's VMEM — the footprint model charges for it."""
    s = 1
    while s * 2 <= min(B, _LANE):
        s *= 2
    return s


def lanes_row_blk(rbp: int, cp: int, slab: int, itemsize: int = 4,
                  budget: int = 1 << 16) -> int:
    """Below-panel rows per lanes grid step: bounds the (rblk, cp, slab)
    block at ~``budget`` PADDED bytes."""
    if rbp == 0:
        return 0
    per_row = pad8(cp) * pad128(slab) * itemsize
    r = max(1, budget // per_row)
    b = 1
    while b * 2 <= min(r, rbp):
        b *= 2
    return b


def lanes_panel_bytes(cp: int, rbp: int, B: int, itemsize: int = 4,
                      lu: bool = False) -> int:
    """Modeled scoped-VMEM stack of chol/lu_panel_deltas_lanes.

    in/out blocks are double-buffered (their index maps vary with the
    grid), the L11/U11 scratch is single, and the fori-loop recurrences
    (_potrf_lanes/_trsm_lanes/_getrf_lanes) keep ~K live full-tile
    temporaries (carry + rank-1 product + masked select)."""
    slab = lanes_slab(B)
    nd = 2 if lu else 1
    K = 4 if lu else 3
    d = tile_bytes((cp, cp, slab), itemsize)
    sv = tile_bytes((1, slab), itemsize)
    if rbp == 0:
        return 2 * (nd * d + sv) + 2 * nd * d + K * d
    rblk = lanes_row_blk(rbp, cp, slab, itemsize,
                         budget=(1 << 17) if lu else (1 << 16))
    b = tile_bytes((rblk, cp, slab), itemsize)
    io = 2 * sv + 2 * nd * (d + b)           # in + out, single-buffered
    return 2 * io + nd * d + K * max(d, b)   # x2 buffers + scratch + temps


def wide_row_blk(rbp: int, cp: int, itemsize: int = 4,
                 budget: int = 1 << 17) -> int:
    """Below rows per wide grid step (~``budget`` padded bytes, >= 32)."""
    if rbp == 0:
        return 0
    per_row = pad128(cp) * itemsize
    r = max(32, budget // per_row)
    b = 32
    while b * 2 <= min(r, rbp):
        b *= 2
    return min(b, rbp)


def wide_panel_bytes(cp: int, rbp: int, B: int, itemsize: int = 4,
                     lu: bool = False) -> int:
    """Modeled scoped-VMEM stack of chol/lu_panel_deltas_wide: per-step
    tiles are a single task's (cp, cp) blocks; the unrolled blocked
    recurrence keeps ~K full tiles live across concatenates."""
    nd = 2 if lu else 1
    K = 8
    d = tile_bytes((1, cp, cp), itemsize)
    if rbp == 0:
        return 4 * nd * d + K * d
    rblk = wide_row_blk(rbp, cp, itemsize,
                        budget=(1 << 16) if lu else (1 << 17))
    b = tile_bytes((1, rblk, cp), itemsize)
    return 4 * nd * (d + b) + nd * d + K * max(d, b)


def extend_add_re(csp: int, total: int, itemsize: int = 4) -> int:
    """Update rows per extend-add grid step: ~2MB of padded tile bytes."""
    per_row = pad128(csp) * itemsize
    return max(8, min(max(total, 8), (1 << 21) // per_row))


def extend_add_bytes(srows: int, csp: int, re: int,
                     itemsize: int = 4) -> int:
    """Modeled stack of extend_add_rows: the slab view is input-output
    aliased (one VMEM residency + the write-back copy), the E blocks
    stream double-buffered."""
    slab = tile_bytes((srows, csp), itemsize)
    e = tile_bytes((re, csp), itemsize)
    return 3 * slab + 3 * e


def no_pallas() -> bool:
    """Kill switch: SPFX_NO_PALLAS=1 routes every kernel to the plain XLA
    path (bench.py's compile-failure fallback)."""
    return os.environ.get("SPFX_NO_PALLAS", "") not in ("", "0")


def route_panel(cp: int, rbp: int, B: int, itemsize: int = 4,
                lu: bool = False) -> str:
    """'blocked' | 'lanes' | 'wide' | 'xla' for a (cp, rbp, B) panel class.

    Default is the blocked-MXU path (round-4 redesign): its only Pallas
    kernel works on (NB, NB, slab) diagonal-block tiles whose footprint is
    independent of cp/rbp/B, and the panel solves / trailing updates are
    XLA einsums — always VMEM-safe, serial work minimal. The whole-panel
    'lanes'/'wide' kernels remain selectable via SPFX_PANEL_KERNEL for
    A/B measurement, still guarded by the footprint model."""
    if no_pallas():
        return "xla"
    forced = os.environ.get("SPFX_PANEL_KERNEL", "")
    if forced == "blocked":
        return "blocked"
    if forced == "mixed":
        # single-pallas-call panel kernel wherever it fits, blocked-MXU
        # otherwise: the scan's per-step floor scales with the TOTAL HLO
        # code across switch branches (tools/step_floor_probe.py v9/v12 —
        # nesting doesn't help, only less code does), and the blocked
        # route unrolls cp/NB block steps of XLA glue per class
        if cp <= LANES_CP_MAX and \
                lanes_panel_bytes(cp, rbp, B, itemsize, lu) <= CAP_ROUTE:
            return "lanes"
        return "blocked"
    if forced and forced != "auto":
        lanes_fit = cp <= LANES_CP_MAX and \
            lanes_panel_bytes(cp, rbp, B, itemsize, lu) <= CAP_ROUTE
        wide_fit = cp <= WIDE_CP_MAX and \
            wide_panel_bytes(cp, rbp, B, itemsize, lu) <= CAP_ROUTE
        if forced == "lanes" and lanes_fit:
            return "lanes"
        if forced == "wide" and wide_fit:
            return "wide"
        return "xla"
    return "blocked"


def assert_fits(name: str, nbytes: int) -> None:
    """Trace-time guard on every pallas_call: a class whose modeled stack
    exceeds CAP_HARD must never reach Mosaic (routing should have sent it
    elsewhere long before this fires)."""
    if nbytes > CAP_HARD:
        raise ValueError(
            f"{name}: modeled scoped-VMEM stack {nbytes / 2**20:.1f}MB "
            f"exceeds CAP_HARD {CAP_HARD / 2**20:.0f}MB "
            f"(limit {LIMIT / 2**20:.0f}MB) — kernel routing bug; "
            "see spfx/kernels/vmem.py")
