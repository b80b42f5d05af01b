"""Two-level Pallas intersection for large scenes: superblock culling +
tiled Moeller-Trumbore with block-level AABB gates.

The scaling answer to the reference's SAH kd-tree (SURVEY.md §2.8 item 1,
/root/reference/include/mitsuba/render/gkdtree.h + skdtree.h): per-ray
pointer-chasing traversal is TPU-hostile, so the hierarchy is flattened to
TWO static levels sized for the memory system instead:

  - triangles are Morton-sorted host-side into BLOCKS of 128 (one VMEM
    tile of the dense intersector) and SUPERBLOCKS of 64 blocks (8192
    tris = one 384 KB DMA);
  - stage A (XLA): every ray slab-tests the few-hundred superblock AABBs;
    a per-(ray-tile, superblock) activity mask is reduced from that;
  - stage B (Pallas): grid (ray_tiles, superblocks); inactive programs
    skip without touching HBM (the triangle table lives in ANY/HBM memory
    space and is DMA'd manually only when the mask says the pair is
    live); active programs gate each 128-tri block on a per-ray AABB test
    (~20 flops/ray) before paying the full 128x512 Moeller-Trumbore tile.

Ray coherence (which makes the tile masks sparse after the first bounce)
is restored by Morton-sorting rays per bounce — see ``sorted_wrapper`` in
accel/traverse.py's intersect_twolevel entry point.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 512
TRI_TILE = 128
SB_BLOCKS = 64                   # blocks per superblock
SB_TRIS = SB_BLOCKS * TRI_TILE   # 8192 triangles per superblock
INF = 3.0e38
EPS_T = 1e-4


class BlockTable(NamedTuple):
    """Device tables produced by ``build_blocks`` (all jnp arrays)."""

    tri_pack: jnp.ndarray   # (S, 16, SB_TRIS) [p0 e1 e2 | orig id | pads];
                            # leading superblock axis so the kernel DMA
                            # slices an untiled dimension
    blk_lo: jnp.ndarray     # (3, Bpad) per-block AABB min (inverted if empty)
    blk_hi: jnp.ndarray     # (3, Bpad)
    sb_lo: jnp.ndarray      # (S, 3) superblock AABB min
    sb_hi: jnp.ndarray      # (S, 3)


def _morton3(x: np.ndarray) -> np.ndarray:
    """(T, 3) centroids in [0,1) -> 30-bit Morton codes."""
    q = np.clip((x * 1024.0).astype(np.uint64), 0, 1023)

    def spread(v):
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])


def build_blocks(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> BlockTable:
    """Host-side: Morton-sort triangles, pack blocks/superblocks + AABBs."""
    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    t = p0.shape[0]
    cent = p0 + (e1 + e2) / 3.0
    lo = cent.min(axis=0)
    ext = np.maximum(cent.max(axis=0) - lo, 1e-9)
    order = np.argsort(_morton3((cent - lo) / ext), kind="stable")

    n_sb = max((t + SB_TRIS - 1) // SB_TRIS, 1)
    tpad = n_sb * SB_TRIS
    bpad = n_sb * SB_BLOCKS

    pack = np.zeros((16, tpad), np.float32)
    pack[9, :] = -1.0
    pack[0:3, :t] = p0[order].T
    pack[3:6, :t] = e1[order].T
    pack[6:9, :t] = e2[order].T
    pack[9, :t] = order.astype(np.float32)
    pack = np.ascontiguousarray(
        pack.reshape(16, n_sb, SB_TRIS).transpose(1, 0, 2)
    )  # (S, 16, SB_TRIS)

    # per-triangle AABBs in sorted order
    v0 = p0[order]
    v1 = v0 + e1[order]
    v2 = v0 + e2[order]
    tri_lo = np.minimum(np.minimum(v0, v1), v2)
    tri_hi = np.maximum(np.maximum(v0, v1), v2)

    blk_lo = np.full((bpad, 3), INF, np.float32)
    blk_hi = np.full((bpad, 3), -INF, np.float32)
    n_blk_real = (t + TRI_TILE - 1) // TRI_TILE
    for b in range(n_blk_real):
        s = slice(b * TRI_TILE, min((b + 1) * TRI_TILE, t))
        blk_lo[b] = tri_lo[s].min(axis=0)
        blk_hi[b] = tri_hi[s].max(axis=0)

    sb_lo = blk_lo.reshape(n_sb, SB_BLOCKS, 3).min(axis=1)
    sb_hi = blk_hi.reshape(n_sb, SB_BLOCKS, 3).max(axis=1)

    return BlockTable(
        tri_pack=jnp.asarray(pack),
        blk_lo=jnp.asarray(blk_lo.T),
        blk_hi=jnp.asarray(blk_hi.T),
        sb_lo=jnp.asarray(sb_lo),
        sb_hi=jnp.asarray(sb_hi),
    )


def superblock_mask(bt: BlockTable, o, d, tmax):
    """Stage A: (n_tiles, S) int32 — 1 where any ray of the tile enters the
    superblock AABB within [0, tmax].  Pure XLA; layout keeps the ray axis
    in lanes ((S, N) broadcasting)."""
    n = o.shape[0]
    npad = ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    ox = jnp.pad(o[:, 0], (0, npad - n))[None]
    oy = jnp.pad(o[:, 1], (0, npad - n))[None]
    oz = jnp.pad(o[:, 2], (0, npad - n))[None]
    pad_d = jnp.pad(d, ((0, npad - n), (0, 0)), constant_values=1.0)
    inv = 1.0 / jnp.where(jnp.abs(pad_d) < 1e-12, 1e-12, pad_d)
    ix, iy, iz = inv[:, 0][None], inv[:, 1][None], inv[:, 2][None]
    tm = jnp.pad(tmax, (0, npad - n), constant_values=-1.0)[None]

    lo, hi = bt.sb_lo, bt.sb_hi  # (S, 3)

    def slab(lo_c, hi_c, oc, ic):
        t0 = (lo_c[:, None] - oc) * ic
        t1 = (hi_c[:, None] - oc) * ic
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    l0, h0 = slab(lo[:, 0], hi[:, 0], ox, ix)
    l1, h1 = slab(lo[:, 1], hi[:, 1], oy, iy)
    l2, h2 = slab(lo[:, 2], hi[:, 2], oz, iz)
    tn = jnp.maximum(jnp.maximum(l0, l1), jnp.maximum(l2, 0.0))
    tf = jnp.minimum(jnp.minimum(h0, h1), h2)
    hit = (tf >= tn) & (tn <= tm)                      # (S, Npad)
    s = lo.shape[0]
    tiles = hit.reshape(s, npad // RAY_TILE, RAY_TILE).any(-1)  # (S, n_tiles)
    # global near-to-far superblock order (mean entry distance over hitting
    # rays): the kernel walks superblocks through this permutation so the
    # per-ray best-t gate prunes far geometry early
    tn_hit = jnp.where(hit, jnp.maximum(tn, 0.0), 0.0)
    cnt = jnp.sum(hit, axis=1)
    mean_tn = jnp.where(cnt > 0, jnp.sum(tn_hit, axis=1) / jnp.maximum(cnt, 1), INF)
    order = jnp.argsort(mean_tn).astype(jnp.int32)
    return tiles.T.astype(jnp.int32), order             # (n_tiles, S), (S,)


def _kernel(mask_ref, order_ref, blk_lo_ref, blk_hi_ref, ray_ref, tmax_ref,
            tri_hbm, out_ref, tri_vmem, sem):
    # ONE program per ray tile; superblocks iterate INSIDE the kernel in
    # near-to-far order (Mosaic per-program overhead is ~microseconds, so a
    # (tiles x superblocks) grid would spend more time sequencing skipped
    # programs than computing — measured 456 ms for an all-skip wave).
    # Inactive (tile, superblock) pairs skip before their DMA is issued.
    i = pl.program_id(0)
    n_sb = mask_ref.shape[1]

    out_ref[0, :] = jnp.minimum(tmax_ref[0, :], INF)
    out_ref[1, :] = jnp.full((RAY_TILE,), -1.0)
    out_ref[2, :] = jnp.zeros((RAY_TILE,))
    out_ref[3, :] = jnp.zeros((RAY_TILE,))

    ray = ray_ref[...]
    ox, oy, oz = ray[0, :][None], ray[1, :][None], ray[2, :][None]
    dx, dy, dz = ray[3, :][None], ray[4, :][None], ray[5, :][None]
    oxf, oyf, ozf = ray[0, :], ray[1, :], ray[2, :]
    ixf = 1.0 / jnp.where(jnp.abs(ray[3, :]) < 1e-12, 1e-12, ray[3, :])
    iyf = 1.0 / jnp.where(jnp.abs(ray[4, :]) < 1e-12, 1e-12, ray[4, :])
    izf = 1.0 / jnp.where(jnp.abs(ray[5, :]) < 1e-12, 1e-12, ray[5, :])

    def sb_body(si, _):
        s = order_ref[si]

        @pl.when(mask_ref[i, s] > 0)
        def _active():
            cp = pltpu.make_async_copy(tri_hbm.at[s], tri_vmem, sem)
            cp.start()
            cp.wait()

            def block_body(k, _):
                cur_t = out_ref[0, :]
                kb = s * SB_BLOCKS + k

                def ax(axis, oc, ic):
                    t0 = (blk_lo_ref[axis, kb] - oc) * ic
                    t1 = (blk_hi_ref[axis, kb] - oc) * ic
                    return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

                l0, h0 = ax(0, oxf, ixf)
                l1, h1 = ax(1, oyf, iyf)
                l2, h2 = ax(2, ozf, izf)
                tn = jnp.maximum(jnp.maximum(l0, l1), jnp.maximum(l2, 0.0))
                tf = jnp.minimum(jnp.minimum(h0, h1), h2)
                gate = (tf >= tn) & (tn <= cur_t)

                @pl.when(jnp.any(gate))
                def _test_block():
                    tri = tri_vmem[:, pl.ds(k * TRI_TILE, TRI_TILE)]
                    tcol = lambda r: tri[r, :][:, None]
                    p0x, p0y, p0z = tcol(0), tcol(1), tcol(2)
                    e1x, e1y, e1z = tcol(3), tcol(4), tcol(5)
                    e2x, e2y, e2z = tcol(6), tcol(7), tcol(8)
                    tri_id = tcol(9)
                    pvx = dy * e2z - dz * e2y
                    pvy = dz * e2x - dx * e2z
                    pvz = dx * e2y - dy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    inv_det = jnp.where(
                        jnp.abs(det) < 1e-12, 0.0,
                        1.0 / jnp.where(det == 0.0, 1.0, det),
                    )
                    tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
                    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                    hit = (
                        (inv_det != 0.0)
                        & (u >= 0.0)
                        & (v >= 0.0)
                        & (u + v <= 1.0)
                        & (t > EPS_T)
                        & (tri_id >= 0.0)
                    )
                    t = jnp.where(hit, t, INF)
                    t_best = jnp.min(t, axis=0)
                    is_best = t == t_best[None, :]
                    big = jnp.float32(2.0e9)
                    prim_best = jnp.min(jnp.where(is_best, tri_id, big), axis=0)
                    first = is_best & (tri_id == prim_best[None, :])
                    u_best = jnp.sum(jnp.where(first, u, 0.0), axis=0)
                    v_best = jnp.sum(jnp.where(first, v, 0.0), axis=0)
                    take = t_best < out_ref[0, :]
                    out_ref[0, :] = jnp.where(take, t_best, out_ref[0, :])
                    out_ref[1, :] = jnp.where(take, prim_best, out_ref[1, :])
                    out_ref[2, :] = jnp.where(take, u_best, out_ref[2, :])
                    out_ref[3, :] = jnp.where(take, v_best, out_ref[3, :])

                return 0

            jax.lax.fori_loop(0, SB_BLOCKS, block_body, 0)

        return 0

    jax.lax.fori_loop(0, n_sb, sb_body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def intersect_blocks(bt: BlockTable, o, d, tmax, interpret: bool = False):
    """Two-level intersection; same output contract as intersect_tiled:
    (t, prim int32, u, v, valid)."""
    n = o.shape[0]
    npad = ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    ray = jnp.zeros((8, npad), jnp.float32)
    ray = ray.at[0:3, :n].set(o.T)
    ray = ray.at[3:6, :n].set(d.T)
    tmax_p = jnp.concatenate([tmax, jnp.zeros((npad - n,), tmax.dtype)])[None, :]
    mask, sb_order = superblock_mask(bt, o, d, tmax)    # (n_tiles, S), (S,)
    n_sb = bt.sb_lo.shape[0]
    grid = (npad // RAY_TILE,)

    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, RAY_TILE), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RAY_TILE), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((4, RAY_TILE), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((16, SB_TRIS), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((4, npad), jnp.float32),
        interpret=interpret,
    )(mask, sb_order, bt.blk_lo, bt.blk_hi, ray, tmax_p, bt.tri_pack)

    t = out[0, :n]
    prim_f = out[1, :n]
    valid = (prim_f >= 0.0) & (t < INF)
    return (
        jnp.where(valid, t, INF),
        jnp.where(valid, prim_f, -1.0).astype(jnp.int32),
        out[2, :n],
        out[3, :n],
        valid,
    )


def _ray_sort_keys(bt: BlockTable, o, d):
    """Morton key of the quantized origin (6 bits/axis) with the direction
    octant in the low bits — the wavefront coherence extraction that makes
    the per-tile superblock masks sparse after the first bounce."""
    lo = jnp.min(bt.sb_lo, axis=0)
    hi = jnp.max(bt.sb_hi, axis=0)
    q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0 - 1e-6)
    cell = (q * 64.0).astype(jnp.int32)  # 6 bits per axis

    def spread2(v):
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    m = (spread2(cell[:, 0]) << 2) | (spread2(cell[:, 1]) << 1) | spread2(cell[:, 2])
    octant = (
        (d[:, 0] >= 0).astype(jnp.int32) * 4
        + (d[:, 1] >= 0).astype(jnp.int32) * 2
        + (d[:, 2] >= 0).astype(jnp.int32)
    )
    return (m << 3) | octant


def intersect_blocks_sorted(bt: BlockTable, o, d, tmax):
    """Morton-sort rays, intersect, scatter results back to ray order."""
    n = o.shape[0]
    perm = jnp.argsort(_ray_sort_keys(bt, o, d))
    t, prim, u, v, valid = intersect_blocks(bt, o[perm], d[perm], tmax[perm])
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
    return t[inv], prim[inv], u[inv], v[inv], valid[inv]
