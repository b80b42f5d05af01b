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
    blk_lo: jnp.ndarray    # (B, 3) per-block AABB (inverted for padding)
    blk_hi: jnp.ndarray    # (B, 3)
    sb_lo: jnp.ndarray     # (S, 3) superblock AABB (SB_BLK consecutive blocks)
    sb_hi: jnp.ndarray     # (S, 3)
    leaf: int              # triangles per block (python int)
    sb_blk: int            # blocks per superblock (python int)


def build_pair_table(p0, e1, e2, bvh, leaf: int = 32, sb_blk: int = 64) -> PairTable:
    """Host-side build: DFS treelet cut at ``leaf`` tris, block tables in
    DFS (spatial) order, superblocks of ``sb_blk`` consecutive blocks."""
    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    prim_idx = np.asarray(bvh.prim_idx)

    ranges = cut_treelets(np.asarray(bvh.child0), np.asarray(bvh.child1), max_tris=leaf)
    n_blk = len(ranges)
    n_sb = max((n_blk + sb_blk - 1) // sb_blk, 1)
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

    return PairTable(
        tri_rows=jnp.asarray(tri_rows),
        blk_lo=jnp.asarray(blk_lo),
        blk_hi=jnp.asarray(blk_hi),
        sb_lo=jnp.asarray(sb_lo),
        sb_hi=jnp.asarray(sb_hi),
        leaf=leaf,
        sb_blk=sb_blk,
    )
