"""Pair-expansion acceleration tables: small SAH-treelet leaves for the
per-ray-group (ray, block) work-list intersector (ops/intersect_pairs.py).

TPU-native replacement for per-ray kd-tree descent
(/root/reference/include/mitsuba/render/gkdtree.h, triaccel_sse.h): the
scene BVH is cut into LEAF-triangle treelet blocks (16-64 tris — much
finer than the 128-tri blocks of accel/blocks.py), consecutive blocks
grouped into superblocks for the hierarchical candidate search.  Unlike
the block-list kernel (per-128-ray-tile union lists -> ~2.5-3.5x dense
waste, round-2 measurements), the pair path builds candidate block lists
per GROUP of 8 Morton-adjacent rays, so every dense Moeller-Trumbore
evaluation is paid only by rays that can actually reach the block.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.accel.blocks import cut_treelets

INF = 3.0e38


class PairTable(NamedTuple):
    """Device tables for the pair intersector (all jnp arrays)."""

    tri_rows: jnp.ndarray  # (B, 10, LEAF) f32: rows p0(3) e1(3) e2(3),
    #                        row 9 = ORIGINAL triangle id (-1 padding)
    blk_lo: jnp.ndarray    # (B, 3) per-block AABB (never-hit for padding)
    blk_hi: jnp.ndarray    # (B, 3)
    sb_lo: jnp.ndarray     # (S, 3) superblock AABB (SB_BLK consecutive blocks)
    sb_hi: jnp.ndarray     # (S, 3)
    tblT: jnp.ndarray      # (SB_BLK*6, S) bf16 transposed box table for the
    #                        one-hot MXU box select (lo rounded down, hi up
    #                        — outward-conservative in bf16)
    nonempty: jnp.ndarray  # (B_ne,) int32 ids of blocks holding triangles
    #                        (dummy sort entries are emitted only for these)
    tri_cols: jnp.ndarray  # (B, 16, 5*LEAF) f32 Pluecker column table for
    #                        the MXU intersection matmul: per triangle 5
    #                        columns (3 edge-Pluecker side tests, plane
    #                        numerator, plane denominator) against the
    #                        16-row ray feature vector [d, o x d, o, 1, 0..]
    prim_loc: jnp.ndarray  # (Ttot,) int32: original tri id -> blk*LEAF+slot
    #                        (winner re-evaluation gathers exact MT inputs)
    tri_flat: jnp.ndarray  # (B*LEAF, 10) f32 row-major copy of tri_rows —
    #                        ONE row gather per winner (9 strided column
    #                        gathers from tri_rows measured 35 ms/call)

    @property
    def leaf(self) -> int:  # triangles per block
        return int(self.tri_rows.shape[2])

    @property
    def sb_blk(self) -> int:  # blocks per superblock
        return int(self.blk_lo.shape[0]) // int(self.sb_lo.shape[0])


def _two_level_cut(child0, child1, leaf: int, sb_blk: int):
    """Two-level BVH cut: superblock subtrees of <= leaf*sb_blk tris,
    each sub-cut into blocks of <= leaf tris.  Both levels are BVH
    subtrees, so superblock AABBs are SAH-tight — round-3 fix for the
    consecutive-DFS-chunk superblocks whose overlapping boxes destroyed
    the nearest-K ordering proofs (proven rate 76% -> see NEXT.md).

    Returns a list of per-superblock lists of (prim_start, prim_count);
    a subtree whose leaf cut yields more than sb_blk blocks is split
    into consecutive chunks of sb_blk (still one subtree, still tight).
    """
    from mitsuba_path_guiding_tpu.accel.blocks import _subtree_ranges

    start, count = _subtree_ranges(child0, child1)

    def cut(root, max_tris):
        out, stack = [], [root]
        while stack:
            nd = stack.pop()
            if count[nd] <= max_tris or child0[nd] < 0:
                out.append(nd)
            else:
                stack.append(int(child1[nd]))
                stack.append(int(child0[nd]))
        return out

    sbs = []
    for r in cut(0, leaf * sb_blk):
        blks = [(int(start[n]), int(count[n])) for n in cut(r, leaf)]
        # greedy merge of DFS-adjacent under-filled blocks: a binary SAH
        # split of a 130-tri subtree yields two ~65-tri leaves — without
        # merging, average fill is ~45%, doubling the block count and
        # with it the dummy sort entries, kernel tiles, and list slots.
        # Adjacent cut leaves are contiguous prim ranges, so a merge is
        # just (start_a, count_a + count_b); the merged AABB is the
        # union of two spatially-adjacent subtrees (same looseness class
        # as the superblock level).
        merged = []
        for s_, c_ in blks:
            if merged and merged[-1][1] + c_ <= leaf:
                merged[-1] = (merged[-1][0], merged[-1][1] + c_)
            else:
                merged.append((s_, c_))
        blks = merged
        for i in range(0, len(blks), sb_blk):
            sbs.append(blks[i : i + sb_blk])
    return sbs


def build_pair_table(p0, e1, e2, bvh, leaf: int = 128, sb_blk: int = 32) -> PairTable:
    """Host-side build: two-level BVH treelet cut; block and superblock
    AABBs are subtree-tight."""
    from mitsuba_path_guiding_tpu.accel.bvh import bvh_host_arrays

    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    child0, child1, prim_idx = bvh_host_arrays(bvh)

    sbs = _two_level_cut(child0, child1, leaf, sb_blk)
    # flatten with per-superblock padding to sb_blk block slots
    ranges = []
    for blks in sbs:
        ranges.extend(blks)
        ranges.extend([(0, 0)] * (sb_blk - len(blks)))
    n_sb = max(len(sbs), 1)
    n_blk = len(ranges)
    bpad = n_sb * sb_blk

    ids = np.full((bpad, leaf), -1, np.int64)
    for b, (s, c) in enumerate(ranges):
        ids[b, :c] = prim_idx[s : s + c]
    flat = ids.reshape(-1)
    safe = np.maximum(flat, 0)

    rows = np.zeros((bpad * leaf, 10), np.float32)
    rows[:, 0:3] = p0[safe]
    rows[:, 3:6] = e1[safe]
    rows[:, 6:9] = e2[safe]
    rows[:, 9] = flat.astype(np.float32)
    tri_rows = np.ascontiguousarray(
        rows.reshape(bpad, leaf, 10).transpose(0, 2, 1)
    )  # (B, 10, LEAF)

    v0 = p0[safe]
    v1 = v0 + e1[safe]
    v2 = v0 + e2[safe]
    valid = (flat >= 0)[:, None]
    tlo = np.where(valid, np.minimum(np.minimum(v0, v1), v2), INF)
    thi = np.where(valid, np.maximum(np.maximum(v0, v1), v2), -INF)
    blk_lo = tlo.reshape(bpad, leaf, 3).min(axis=1)
    blk_hi = thi.reshape(bpad, leaf, 3).max(axis=1)
    sb_lo = blk_lo.reshape(n_sb, sb_blk, 3).min(axis=1)
    sb_hi = blk_hi.reshape(n_sb, sb_blk, 3).max(axis=1)
    # Empty padding blocks: an inverted (+INF, -INF) box PASSES the slab
    # test when the direction sign flips the planes.  Encode as a
    # degenerate plane pair at +/-3e38 with alternating axis signs: for
    # every direction-sign combination at least one axis yields an empty
    # or beyond-tmax interval, except a measure-zero huge-t corner whose
    # packed key sorts dead last (harmless extra pair, MT finds nothing).
    # NaN is NOT usable: it would poison the one-hot matmul box select
    # (NaN * 0 = NaN contaminates every ray's accumulated sum).
    empty = ~(flat >= 0).reshape(bpad, leaf).any(axis=1)
    far = np.float32([INF, -INF, INF])
    blk_lo[empty] = far
    blk_hi[empty] = far

    # transposed (SB_BLK*6, S) bf16 box table, outward directed rounding
    tbl = np.concatenate(
        [blk_lo.reshape(n_sb, sb_blk, 3), blk_hi.reshape(n_sb, sb_blk, 3)],
        axis=2,
    ).reshape(n_sb, sb_blk * 6)
    is_hi = np.zeros((sb_blk, 6), bool)
    is_hi[:, 3:] = True
    tblT = np.where(
        is_hi.reshape(-1)[:, None],
        _bf16_ceil(tbl.T),
        _bf16_floor(tbl.T),
    )

    # Pluecker column table for the MXU intersection matmul (see
    # ops/intersect_pairs.py): ray features F = [d(0:3), o x d(3:6),
    # o(6:9), 1(9), 0(10:16)]; per-tri columns (group-major g*LEAF + j):
    #   g=0..2 edge (a->b): rows0:3 = a x b, rows3:6 = b - a
    #           -> s = d.(a x b) + (b - a).(o x d)  (Pluecker side)
    #   g=3 num: rows6:9 = -n, row9 = n.v0  -> num = n.(v0 - o)
    #   g=4 den: rows0:3 = n                -> den = n.d ;  t = num/den
    vflat = valid.reshape(-1)
    w0, w1, w2 = v0, v1, v2
    nvec = np.cross(e1[safe], e2[safe])
    cols = np.zeros((bpad * leaf, 5, 16), np.float32)
    for g, (a, b) in enumerate(((w0, w1), (w1, w2), (w2, w0))):
        cols[:, g, 0:3] = np.cross(a, b)
        cols[:, g, 3:6] = b - a
    cols[:, 3, 6:9] = -nvec
    cols[:, 3, 9] = (nvec * w0).sum(-1)
    cols[:, 4, 0:3] = nvec
    cols[~vflat] = 0.0  # padding tris: s=0, den=0 -> always miss
    tri_cols = np.ascontiguousarray(
        cols.reshape(bpad, leaf, 5, 16).transpose(0, 3, 2, 1)
        .reshape(bpad, 16, 5 * leaf)
    )

    n_tri = int(p0.shape[0])
    prim_loc = np.zeros((max(n_tri, 1),), np.int32)
    where_real = flat >= 0
    prim_loc[flat[where_real]] = np.nonzero(where_real)[0].astype(np.int32)

    return PairTable(
        tri_rows=jnp.asarray(tri_rows),
        blk_lo=jnp.asarray(blk_lo),
        blk_hi=jnp.asarray(blk_hi),
        sb_lo=jnp.asarray(sb_lo),
        sb_hi=jnp.asarray(sb_hi),
        tblT=jnp.asarray(tblT).astype(jnp.bfloat16),
        nonempty=jnp.asarray(np.where(~empty)[0].astype(np.int32)),
        tri_cols=jnp.asarray(tri_cols),
        prim_loc=jnp.asarray(prim_loc),
        tri_flat=jnp.asarray(rows),
    )


def _bf16_floor(x):
    """Largest bf16 (as f32) <= x, elementwise (finite f32 input)."""
    b = np.ascontiguousarray(x, np.float32).view(np.uint32)
    hi = b >> 16
    rem = (b & 0xFFFF) != 0
    neg = (b >> 31) != 0
    hi = hi + np.where(neg & rem, np.uint32(1), np.uint32(0))
    return (hi << 16).view(np.float32).reshape(x.shape)


def _bf16_ceil(x):
    """Smallest bf16 (as f32) >= x, elementwise (finite f32 input)."""
    b = np.ascontiguousarray(x, np.float32).view(np.uint32)
    hi = b >> 16
    rem = (b & 0xFFFF) != 0
    pos = (b >> 31) == 0
    hi = hi + np.where(pos & rem, np.uint32(1), np.uint32(0))
    return (hi << 16).view(np.float32).reshape(x.shape)
