"""Nested dissection by BFS level-set separators (George-Liu automatic ND).

The reference's active ordering is METIS_NodeND (Cholesky/Source/
SparseFrame.c:864-954). spfx implements the same algorithm family natively:
recursively split the graph with a small vertex separator, order the two
halves first and the separator last. Separators come from the middle level of
a BFS from a pseudo-peripheral vertex — not as strong as METIS's multilevel
partitioning, but the right structure (separator-last ordering is what makes
the etree wide and the supernodal levels fat, which is exactly what the TPU
batching wants).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import connected_components

from .amd import amd_dense_tail


def _pseudo_peripheral(adj: sp.csr_matrix, start: int) -> int:
    """Return an (approximately) peripheral vertex by repeated BFS sweeps."""
    n = adj.shape[0]
    node = start
    last_ecc = -1
    for _ in range(4):
        level = _bfs_levels_vec(adj, node, n)
        ecc = int(level.max())
        if ecc <= last_ecc:
            break
        last_ecc = ecc
        # farthest vertex, ties broken by lowest degree
        far = np.flatnonzero(level == ecc)
        degs = np.diff(adj.indptr)[far]
        node = int(far[np.argmin(degs)])
    return node


def _bfs_levels_vec(adj: sp.csr_matrix, start: int, n: int) -> np.ndarray:
    """Vectorised BFS levels using sparse mat-vec frontier expansion."""
    level = np.full(n, -1, dtype=np.int64)
    level[start] = 0
    frontier = np.zeros(n, dtype=bool)
    frontier[start] = True
    seen = frontier.copy()
    d = 0
    while frontier.any():
        d += 1
        nxt = (adj @ frontier.astype(np.int8)).astype(bool) & ~seen
        level[nxt] = d
        seen |= nxt
        frontier = nxt
    return level


def nested_dissection(A: sp.spmatrix, leaf_size: int = 96) -> np.ndarray:
    """Nested-dissection permutation of the symmetric pattern of A.

    Returns perm (int64): column k of PAP^T is column perm[k] of A.
    """
    A = sp.csc_matrix(A)
    n = A.shape[0]
    S = ((A != 0) + (A != 0).T)
    S.setdiag(0)
    S.eliminate_zeros()
    S = S.tocsr().astype(np.int8)

    perm_out = np.empty(n, dtype=np.int64)
    pos = 0

    # explicit stack of (vertex-subset, emit-position-at-end) tasks.
    # Each task orders its subset into perm_out[pos:pos+len(subset)] with the
    # separator placed last; halves are pushed as subtasks.
    # We process with a two-phase scheme: stack entries are (ids,) to order.
    stack = [np.arange(n, dtype=np.int64)]
    # we must emit leaves in DFS order where separators come after their
    # halves; use recursion-free approach emitting into slices.
    out_slices = [(0, n)]
    while stack:
        ids = stack.pop()
        lo, hi = out_slices.pop()
        m = len(ids)
        if m <= leaf_size:
            sub = S[ids][:, ids]
            perm_out[lo:lo + m] = ids[amd_dense_tail(sub)]
            continue
        sub = S[ids][:, ids]
        ncomp, labels = connected_components(sub, directed=False)
        if ncomp > 1:
            # order components one after another
            offset = lo
            for c in range(ncomp):
                cid = np.where(labels == c)[0]
                stack.append(ids[cid])
                out_slices.append((offset, offset + len(cid)))
                offset += len(cid)
            continue
        # find separator via BFS levels from a pseudo-peripheral vertex
        degs = np.diff(sub.indptr)
        start = _pseudo_peripheral(sub, int(np.argmin(degs)))
        level = _bfs_levels_vec(sub, start, m)
        maxlev = int(level.max())
        if maxlev < 2:
            # graph is (almost) complete — no useful separator; order directly
            perm_out[lo:lo + m] = ids[amd_dense_tail(sub)]
            continue
        # choose the level whose removal best balances the halves, weighted
        # against separator size
        sizes = np.bincount(level, minlength=maxlev + 1)
        below = np.cumsum(sizes) - sizes
        above = m - np.cumsum(sizes)
        cand = np.arange(1, maxlev)
        balance = np.minimum(below[cand], above[cand]).astype(np.float64)
        score = balance - 4.0 * sizes[cand]
        k = int(cand[np.argmax(score)])
        sep = level == k
        half_a = level < k
        half_b = level > k
        na, nb, ns = int(half_a.sum()), int(half_b.sum()), int(sep.sum())
        # order: half_a, half_b, separator(last)
        sep_ids = ids[sep]
        perm_out[lo + na + nb: lo + m] = sep_ids
        stack.append(ids[half_a])
        out_slices.append((lo, lo + na))
        stack.append(ids[half_b])
        out_slices.append((lo + na, lo + na + nb))
    return perm_out
