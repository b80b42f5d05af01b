"""SAH-treelet block decomposition for the TPU block-list intersector.

TPU-native replacement for the reference's SAH kd-tree traversal
(/root/reference/include/mitsuba/render/gkdtree.h, skdtree.h,
triaccel_sse.h): instead of per-ray pointer chasing, the scene's SAH BVH
(accel/bvh.py / cpp/bvh_builder.cpp) is CUT into *treelet blocks* of at
most 128 triangles — the tile size of the dense Moeller-Trumbore kernel.
Because each block is a BVH subtree, its AABB is as tight as the SAH
build makes it (much tighter than Morton-chunk blocks), which is what
drives culling quality.

Consecutive blocks (treelet DFS order == spatial order) are grouped into
SUPERBLOCKS of 32 blocks = one 256 KB DMA; the runtime culling pipeline
lives in ops/intersect_blocklist.py.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

BLOCK_TRIS = 128      # triangles per treelet block (HBM lane tile)
SB_BLOCKS = 32        # blocks per superblock (one DMA unit)
SB_TRIS = SB_BLOCKS * BLOCK_TRIS
INF = 3.0e38


class BlockList(NamedTuple):
    """Device tables for ops/intersect_blocklist.py (all jnp arrays)."""

    tri_pack: jnp.ndarray  # (S, SB_BLOCKS, 16, BLOCK_TRIS) f32; rows
    #                        p0(3) e1(3) e2(3), row 9 = ORIGINAL triangle
    #                        id (-1 padding).  Block-major so the kernel
    #                        indexes blocks on an untiled leading dim
    blk_box: jnp.ndarray   # (S, SB_BLOCKS, 8) f32: cols 0:3 lo, 3:6 hi
    #                        (inverted box for padding blocks), 6:8 pad —
    #                        per-superblock tile read by the kernel
    sb_lo: jnp.ndarray     # (S, 3) superblock AABB
    sb_hi: jnp.ndarray     # (S, 3)
    n_blocks: int          # real block count (python int)


def _subtree_ranges(child0: np.ndarray, child1: np.ndarray):
    """Per-node (prim_start, prim_count) for the flattened BVH, by
    vectorized bottom-up fixpoint: each pass resolves one more tree level
    above the leaves (O(depth) numpy passes instead of an O(nodes)
    Python loop)."""
    n = child0.shape[0]
    leaf = child0 < 0
    start = np.where(leaf, -(child0 + 1), 0).astype(np.int64)
    count = np.where(leaf, -child1, 0).astype(np.int64)
    done = leaf.copy()
    c0 = np.where(leaf, 0, child0)
    c1 = np.where(leaf, 0, child1)
    for _ in range(64):
        if done.all():
            break
        ready = ~done & done[c0] & done[c1]
        if not ready.any():
            raise ValueError("BVH child graph is not a tree")
        start[ready] = np.minimum(start[c0[ready]], start[c1[ready]])
        count[ready] = count[c0[ready]] + count[c1[ready]]
        done |= ready
    else:
        raise ValueError("BVH deeper than 64 levels")
    return start, count


def cut_treelets(child0: np.ndarray, child1: np.ndarray, max_tris: int = BLOCK_TRIS):
    """DFS cut of the BVH into subtrees of <= max_tris prims.

    Returns a list of (prim_start, prim_count) ranges in DFS (spatial)
    order; ranges are contiguous in the BVH's prim_idx permutation."""
    start, count = _subtree_ranges(child0, child1)
    out = []
    stack = [0]
    while stack:
        node = stack.pop()
        if count[node] <= max_tris or child0[node] < 0:
            out.append((int(start[node]), int(count[node])))
        else:
            # push right first so left (near in build order) pops first
            stack.append(int(child1[node]))
            stack.append(int(child0[node]))
    return out


def build_blocklist(p0, e1, e2, bvh) -> BlockList:
    """Host-side table build from triangle arrays + their SAH BVH."""
    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    from mitsuba_path_guiding_tpu.accel.bvh import bvh_host_arrays

    child0, child1, prim_idx = bvh_host_arrays(bvh)

    ranges = cut_treelets(child0, child1)
    n_blk = len(ranges)
    n_sb = max((n_blk + SB_BLOCKS - 1) // SB_BLOCKS, 1)
    bpad = n_sb * SB_BLOCKS

    # flat per-block triangle id lists, padded to BLOCK_TRIS
    ids = np.full((bpad, BLOCK_TRIS), -1, np.int64)
    for b, (s, c) in enumerate(ranges):
        ids[b, :c] = prim_idx[s : s + c]

    flat = ids.reshape(-1)           # (bpad * BLOCK_TRIS,)
    safe = np.maximum(flat, 0)
    pack = np.zeros((16, bpad * BLOCK_TRIS), np.float32)
    pack[0:3] = p0[safe].T
    pack[3:6] = e1[safe].T
    pack[6:9] = e2[safe].T
    pack[9] = flat.astype(np.float32)  # -1 marks padding
    pack = np.ascontiguousarray(
        pack.reshape(16, n_sb, SB_BLOCKS, BLOCK_TRIS).transpose(1, 2, 0, 3)
    )  # (S, SB_BLOCKS, 16, BLOCK_TRIS)

    # tight per-block AABBs from the member triangles
    v0 = p0[safe]
    v1 = v0 + e1[safe]
    v2 = v0 + e2[safe]
    valid = (flat >= 0)[:, None]
    tlo = np.where(valid, np.minimum(np.minimum(v0, v1), v2), INF)
    thi = np.where(valid, np.maximum(np.maximum(v0, v1), v2), -INF)
    blk_lo = tlo.reshape(bpad, BLOCK_TRIS, 3).min(axis=1)
    blk_hi = thi.reshape(bpad, BLOCK_TRIS, 3).max(axis=1)

    blk_box = np.zeros((bpad, 8), np.float32)
    blk_box[:, 0:3] = blk_lo
    blk_box[:, 3:6] = blk_hi
    blk_box = blk_box.reshape(n_sb, SB_BLOCKS, 8)

    sb_lo = blk_lo.reshape(n_sb, SB_BLOCKS, 3).min(axis=1)
    sb_hi = blk_hi.reshape(n_sb, SB_BLOCKS, 3).max(axis=1)

    return BlockList(
        tri_pack=jnp.asarray(pack),
        blk_box=jnp.asarray(blk_box),
        sb_lo=jnp.asarray(sb_lo),
        sb_hi=jnp.asarray(sb_hi),
        n_blocks=n_blk,
    )
