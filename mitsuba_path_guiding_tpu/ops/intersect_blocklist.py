"""Block-list Pallas intersector: per-ray-tile candidate superblock lists
with near-to-far early termination and double-buffered DMA.

The large-scene TPU path replacing the reference's SIMD-packet kd-tree
traversal (/root/reference/include/mitsuba/render/skdtree.h:55-69,
triaccel_sse.h).  Pipeline:

  stage A (XLA, ``candidate_superblocks``): rays are processed in tiles of
  RAY_TILE; each tile's conservative bounds (origin box + direction
  interval) are slab-tested against every superblock AABB by interval
  arithmetic, and the hits are top_k-compacted into a NEAR-TO-FAR ordered
  candidate list per tile (key = conservative entry distance).

  stage B (Pallas, ``_kernel``): one program per ray tile walks its
  candidate list with a while_loop that TERMINATES once every ray's best
  hit is closer than the next candidate's conservative entry distance —
  the TPU equivalent of ordered kd-tree descent.  Superblock triangle
  packs (256 KB) are DMA'd HBM->VMEM double-buffered so the copy rides
  under the previous superblock's compute.  Within a superblock, each
  128-triangle treelet block is gated by a per-ray AABB test against the
  rays' CURRENT best t; only tiles where some ray passes pay the dense
  (128 x RAY_TILE) Moeller-Trumbore evaluation.

Overflow safety: if a tile's candidate count exceeds the static list
width K, the kernel falls back to walking every superblock in index
order (no early exit) — slower, never wrong.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mitsuba_path_guiding_tpu.accel.blocks import BLOCK_TRIS, SB_BLOCKS, SB_TRIS, BlockList

RAY_TILE = 256
SUB_TILE = 128          # per-subtile gating granularity inside a ray tile
N_SUB = RAY_TILE // SUB_TILE
INF = 3.0e38
EPS_T = 1e-4
MAX_CAND = 128  # static candidate-list width (fallback path above this);
#                 SMEM cost is nt * MAX_CAND * 4 B (512 KB at 1024 tiles)
DEBUG_COUNTERS = False  # adds (j_end, MT-visits) rows 4/5 to the output


def _pad_rays(o, d, tmax):
    """Pad to a RAY_TILE multiple by replicating the last ray with tmax=0
    (keeps the last tile's conservative bounds tight)."""
    n = o.shape[0]
    npad = ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    pad = npad - n
    o_p = jnp.concatenate([o, jnp.broadcast_to(o[-1:], (pad, 3))])
    d_p = jnp.concatenate([d, jnp.broadcast_to(d[-1:], (pad, 3))])
    t_p = jnp.concatenate([tmax, jnp.zeros((pad,), tmax.dtype)])
    return o_p, d_p, t_p, npad


def candidate_superblocks(sb_lo, sb_hi, o, d, tmax, k=MAX_CAND):
    """Stage A. Rays already padded to a RAY_TILE multiple.

    Returns (cand (nt, k) int32 packed keys [tn_bits_hi16 << 16 | sb_id]
    ascending by entry distance, cnt (nt,) int32 RAW hit count — may
    exceed k, which flags the kernel's walk-everything fallback)."""
    npad = o.shape[0]
    nt = npad // RAY_TILE
    s = sb_lo.shape[0]
    k = min(k, s) if s >= 1 else 1

    # component-major layout: a trailing axis of 3 would be lane-padded to
    # 128 by the TPU tiler (measured 25 ms of pure relayout traffic here)
    ot = o.T.reshape(3, nt, RAY_TILE)
    dt = d.T.reshape(3, nt, RAY_TILE)
    olo = ot.min(axis=2).T   # (nt, 3) — tiny, transpose is free
    ohi = ot.max(axis=2).T
    dlo = dt.min(axis=2).T
    dhi = dt.max(axis=2).T
    tmx = tmax.reshape(nt, RAY_TILE).max(axis=1)  # (nt,)

    eps = 1e-12
    tn = jnp.zeros((nt, s))
    tf = jnp.full((nt, s), INF)
    for a in range(3):
        con = (dlo[:, a] > eps) | (dhi[:, a] < -eps)          # (nt,)
        safe_dlo = jnp.where(con, dlo[:, a], 1.0)
        safe_dhi = jnp.where(con, dhi[:, a], 1.0)
        ilo = 1.0 / safe_dhi                                   # (nt,)
        ihi = 1.0 / safe_dlo
        # interval (box_plane - origin) for both planes: (nt, s)
        lo_m_lo = sb_lo[:, a][None, :] - ohi[:, a][:, None]
        lo_m_hi = sb_lo[:, a][None, :] - olo[:, a][:, None]
        hi_m_lo = sb_hi[:, a][None, :] - ohi[:, a][:, None]
        hi_m_hi = sb_hi[:, a][None, :] - olo[:, a][:, None]
        il = ilo[:, None]
        ih = ihi[:, None]

        def iprod_bounds(x0, x1):
            c = jnp.stack([x0 * il, x0 * ih, x1 * il, x1 * ih])
            return c.min(axis=0), c.max(axis=0)

        t0_lo, t0_hi = iprod_bounds(lo_m_lo, lo_m_hi)
        t1_lo, t1_hi = iprod_bounds(hi_m_lo, hi_m_hi)
        tn_a = jnp.minimum(t0_lo, t1_lo)
        tf_a = jnp.maximum(t0_hi, t1_hi)
        # unconstrained axis (direction interval straddles 0): only keep
        # the no-overlap-impossible default [0, INF)
        tn_a = jnp.where(con[:, None], tn_a, 0.0)
        tf_a = jnp.where(con[:, None], tf_a, INF)
        tn = jnp.maximum(tn, tn_a)
        tf = jnp.minimum(tf, tf_a)

    tn = jnp.maximum(tn, 0.0)
    hit = (tf >= tn) & (tn <= tmx[:, None])
    cnt = jnp.sum(hit, axis=1).astype(jnp.int32)
    # pack (truncated tn bits | superblock id) into one int32 so the whole
    # candidate table fits SMEM: positive-f32 bit patterns are monotonic,
    # truncating the mantissa to the top 16 bits rounds DOWN (stays a
    # conservative lower bound of the entry distance)
    tn_bits = jax.lax.bitcast_convert_type(tn.astype(jnp.float32), jnp.int32)
    neg = jnp.where(hit, -tn_bits, jnp.iinfo(jnp.int32).min)
    vals, idx = jax.lax.top_k(neg, k)          # descending -tn = ascending tn
    packed = jnp.bitwise_or(
        jnp.bitwise_and(-vals, jnp.int32(-65536)), idx.astype(jnp.int32)
    )
    return packed, cnt


def _kernel(cand_ref, cnt_ref, ray_ref, tmax_ref, blk_box_ref,
            tri_hbm, out_ref, tri_vmem, bits_ref, sem, any_hit=False,
            k_cand=MAX_CAND):
    # cand_ref is FLAT (nt*k,): a 2-D SMEM prefetch operand is padded to
    # 128 ints per row (measured: s32[2048,48] allocated as 1.0 MB ->
    # SMEM OOM); the flat layout costs exactly nt*k*4 bytes
    i = pl.program_id(0)
    n_sb = tri_hbm.shape[0]

    out_ref[0, :] = jnp.minimum(tmax_ref[0, :], INF)
    out_ref[1, :] = jnp.full((RAY_TILE,), -1.0)
    out_ref[2, :] = jnp.zeros((RAY_TILE,))
    out_ref[3, :] = jnp.zeros((RAY_TILE,))

    cnt_raw = cnt_ref[i]
    use_list = cnt_raw <= k_cand
    n_iter = jnp.where(use_list, cnt_raw, n_sb)

    def sb_id(j):
        v = cand_ref[i * k_cand + jnp.minimum(j, k_cand - 1)]
        return jnp.where(use_list, jnp.bitwise_and(v, 0xFFFF), j)

    def sb_key_hi(j):
        # truncated-f32 entry-distance bits (high 16); the fallback path
        # returns 0 which disables the early exit
        v = cand_ref[i * k_cand + jnp.minimum(j, k_cand - 1)]
        return jnp.where(use_list, jnp.right_shift(v, 16), 0)

    ray = ray_ref[...]
    ox, oy, oz = ray[0, :][None], ray[1, :][None], ray[2, :][None]
    dx, dy, dz = ray[3, :][None], ray[4, :][None], ray[5, :][None]
    ix = 1.0 / jnp.where(jnp.abs(dx) < 1e-12, 1e-12, dx)
    iy = 1.0 / jnp.where(jnp.abs(dy) < 1e-12, 1e-12, dy)
    iz = 1.0 / jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)
    shifts = jax.lax.broadcasted_iota(jnp.int32, (SB_BLOCKS, 1), 0)

    def dma(slot, sb):
        return pltpu.make_async_copy(tri_hbm.at[sb], tri_vmem.at[slot], sem.at[slot])

    @pl.when(n_iter > 0)
    def _warm():
        dma(0, sb_id(0)).start()

    def cond(carry):
        j, worst_hi = carry
        # exit when even the conservative entry distance of the next
        # (near-to-far ordered) superblock exceeds every ray's best hit;
        # compared on truncated positive-f32 bit patterns (monotonic)
        return (j < n_iter) & (sb_key_hi(j) <= worst_hi)

    def body(carry):
        j, _worst_hi = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_iter)
        def _prefetch():
            dma(jax.lax.rem(j + 1, 2), sb_id(j + 1)).start()

        dma(slot, sb_id(j)).wait()
        sb = sb_id(j)

        # vectorized per-(block, ray) AABB gates for the whole superblock,
        # reduced to one 32-bit block activity mask PER 128-ray subtile so
        # a dense block only pays Moeller-Trumbore for the quarter-tiles
        # whose rays can actually reach it
        box = blk_box_ref[sb]                       # (SB_BLOCKS, 8)
        cur_row = out_ref[0, :][None, :]            # (1, RAY_TILE)

        def ax(a, oc, ic):
            t0 = (box[:, a][:, None] - oc) * ic
            t1 = (box[:, a + 3][:, None] - oc) * ic
            return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

        l0, h0 = ax(0, ox, ix)
        l1, h1 = ax(1, oy, iy)
        l2, h2 = ax(2, oz, iz)
        tnr = jnp.maximum(jnp.maximum(l0, l1), jnp.maximum(l2, 0.0))
        tfr = jnp.minimum(jnp.minimum(h0, h1), h2)
        gate = (tfr >= tnr) & (tnr <= cur_row)      # (SB_BLOCKS, RAY_TILE)
        for s in range(N_SUB):
            anyg = jnp.any(
                gate[:, s * SUB_TILE : (s + 1) * SUB_TILE], axis=1, keepdims=True
            )
            bits_ref[s] = jnp.sum(
                jnp.where(anyg, jnp.left_shift(jnp.int32(1), shifts), 0)
            )

        def sub_body(s, _):
            # iterate only the SET bits of the block mask (mean set bits per
            # superblock visit is ~2 — a fixed 32-iteration scalar loop was
            # the kernel's measured bottleneck)
            def w_cond(bits):
                return bits != 0

            def w_body(bits):
                low = jnp.bitwise_and(bits, jnp.negative(bits))
                # branchless integer log2 of the isolated power of two
                # (scalar bitcast/clz are unavailable in Mosaic)
                b = jnp.int32(0)
                for shift, mask in (
                    (16, -65536),          # 0xFFFF0000
                    (8, -16711936),        # 0xFF00FF00
                    (4, -252645136),       # 0xF0F0F0F0
                    (2, -858993460),       # 0xCCCCCCCC
                    (1, -1431655766),      # 0xAAAAAAAA
                ):
                    b = b + jnp.where(
                        jnp.bitwise_and(low, jnp.int32(mask)) != 0, shift, 0
                    )
                _mt(b, s)
                return jnp.bitwise_and(bits, bits - 1)

            def _mt(b, s):
                    lane = pl.ds(pl.multiple_of(s * SUB_TILE, SUB_TILE), SUB_TILE)
                    tri = tri_vmem[slot, b]  # (16, BLOCK_TRIS), untiled idx
                    tcol = lambda r: tri[r, :][:, None]
                    rrow = lambda r: ray_ref[r, lane][None, :]
                    sdx, sdy, sdz = rrow(3), rrow(4), rrow(5)
                    sox, soy, soz = rrow(0), rrow(1), rrow(2)
                    p0x, p0y, p0z = tcol(0), tcol(1), tcol(2)
                    e1x, e1y, e1z = tcol(3), tcol(4), tcol(5)
                    e2x, e2y, e2z = tcol(6), tcol(7), tcol(8)
                    tri_id = tcol(9)
                    pvx = sdy * e2z - sdz * e2y
                    pvy = sdz * e2x - sdx * e2z
                    pvz = sdx * e2y - sdy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    inv_det = jnp.where(
                        jnp.abs(det) < 1e-12, 0.0,
                        1.0 / jnp.where(det == 0.0, 1.0, det),
                    )
                    tvx, tvy, tvz = sox - p0x, soy - p0y, soz - p0z
                    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    v = (sdx * qvx + sdy * qvy + sdz * qvz) * inv_det
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
                    cur = out_ref[0, lane]
                    if any_hit:
                        # occlusion query: any t < per-ray budget kills the
                        # ray (cur = -1 fails every later AABB gate)
                        got = jnp.any(t < cur[None, :], axis=0)
                        out_ref[0, lane] = jnp.where(got, -1.0, cur)
                        out_ref[1, lane] = jnp.where(
                            got, 1.0, out_ref[1, lane]
                        )
                    else:
                        t_best = jnp.min(t, axis=0)
                        is_best = t == t_best[None, :]
                        big = jnp.float32(2.0e9)
                        prim_best = jnp.min(jnp.where(is_best, tri_id, big), axis=0)
                        first = is_best & (tri_id == prim_best[None, :])
                        u_best = jnp.sum(jnp.where(first, u, 0.0), axis=0)
                        v_best = jnp.sum(jnp.where(first, v, 0.0), axis=0)
                        take = t_best < cur
                        out_ref[0, lane] = jnp.where(take, t_best, cur)
                        out_ref[1, lane] = jnp.where(take, prim_best, out_ref[1, lane])
                        out_ref[2, lane] = jnp.where(take, u_best, out_ref[2, lane])
                        out_ref[3, lane] = jnp.where(take, v_best, out_ref[3, lane])
                    if DEBUG_COUNTERS:
                        bits_ref[N_SUB] = bits_ref[N_SUB] + 1

            jax.lax.while_loop(w_cond, w_body, bits_ref[s])
            return 0

        jax.lax.fori_loop(0, N_SUB, sub_body, 0)
        worst_bits = jnp.max(
            jax.lax.bitcast_convert_type(out_ref[0, :], jnp.int32)
        )
        return j + 1, jnp.right_shift(worst_bits, 16)

    if DEBUG_COUNTERS:
        bits_ref[N_SUB] = 0
    inf_hi = jnp.int32(0x7F80)  # f32 +inf bits >> 16
    j_end, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), inf_hi))

    # early exit leaves the prefetched copy for j_end in flight — drain it
    # (an unconsumed DMA semaphore at kernel end aborts the TPU)
    @pl.when(j_end < n_iter)
    def _drain():
        dma(jax.lax.rem(j_end, 2), sb_id(j_end)).wait()

    if DEBUG_COUNTERS:
        out_ref[4, :] = jnp.full((RAY_TILE,), 1.0) * j_end.astype(jnp.float32)
        out_ref[5, :] = jnp.full((RAY_TILE,), 1.0) * bits_ref[N_SUB].astype(jnp.float32)


def _run_kernel(bl: BlockList, o_p, d_p, t_p, k: int = MAX_CAND,
                interpret: bool = False, any_hit: bool = False):
    """Stage A + pallas kernel on padded rays; returns the raw (rows, npad)
    output (rows 4/5 are debug counters when DEBUG_COUNTERS)."""
    npad = o_p.shape[0]
    if bl.sb_lo.shape[0] > 65535:
        raise ValueError("blocklist: more than 65535 superblocks (packed-key limit)")
    # SMEM budget: the candidate table is a prefetched SMEM operand and
    # core SMEM is 1 MB (measured: 2048 tiles x 89 cands x 4 B = 729 KB
    # plus other users OOMs).  Cap k so the table stays <= 768 KB; tiles
    # whose raw hit count exceeds k use the walk-everything fallback.
    nt_ = npad // RAY_TILE
    k = max(8, min(k, (768 * 1024 // 4) // max(nt_, 1)))
    cand, cnt = candidate_superblocks(bl.sb_lo, bl.sb_hi, o_p, d_p, t_p, k=k)

    ray = jnp.concatenate(
        [o_p.T, d_p.T, jnp.zeros((2, npad))], axis=0
    ).astype(jnp.float32)
    tmax_row = t_p[None, :].astype(jnp.float32)
    nt = npad // RAY_TILE
    k = cand.shape[1]

    out = pl.pallas_call(
        partial(_kernel, any_hit=any_hit, k_cand=k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((8, RAY_TILE), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RAY_TILE), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (6 if DEBUG_COUNTERS else 4, RAY_TILE),
                lambda i, *_: (0, i),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, SB_BLOCKS, 16, BLOCK_TRIS), jnp.float32),
                pltpu.SMEM((N_SUB + 1,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((6 if DEBUG_COUNTERS else 4, npad), jnp.float32),
        interpret=interpret,
    )(cand.reshape(-1), cnt, ray, tmax_row, bl.blk_box, bl.tri_pack)
    return out


@partial(jax.jit, static_argnames=("k",))
def _debug_call(bl: BlockList, o_p, d_p, t_p, k: int = MAX_CAND):
    """Raw padded-output call for tools/diag_blocklist.py."""
    return _run_kernel(bl, o_p, d_p, t_p, k=k)


@partial(jax.jit, static_argnames=("interpret", "k"))
def intersect_blocklist_raw(bl: BlockList, o, d, tmax, interpret: bool = False,
                            k: int = MAX_CAND):
    """Closest hit through the candidate-list kernel.  Returns
    (t, prim int32, u, v, valid) — the Hit tuple contract of
    accel/traverse.py."""
    n = o.shape[0]
    o_p, d_p, t_p, _ = _pad_rays(o, d, tmax)
    out = _run_kernel(bl, o_p, d_p, t_p, k=k, interpret=interpret)

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


def _ray_sort_keys(bl: BlockList, o, d, pos_bits: int = 4, dir_bits: int = 5):
    """Morton key (pos_bits/axis origin cell, then Morton-ordered
    octahedral direction at dir_bits/component): per-wave coherence
    extraction so ray tiles have tight conservative bounds.

    Position cells must be COARSE enough that a cell holds several
    RAY_TILEs of rays — only then does the within-cell direction sort
    produce tiles with narrow direction cones (measured: 6-bit cells on a
    524k-ray bounce wave leave ~131 rays/cell, tiles span many cells with
    full-sphere direction ranges, and candidate lists cover 80% of the
    scene).  Direction bits use 2-D Morton order so consecutive keys are
    angularly adjacent, not scanline-wrapped."""
    lo = jnp.min(bl.sb_lo, axis=0)
    hi = jnp.max(bl.sb_hi, axis=0)
    q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0 - 1e-6)
    res = 1 << pos_bits
    cell = (q * res).astype(jnp.int32)

    def spread3(v):
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    def spread2(v):
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    m = (spread3(cell[:, 0]) << 2) | (spread3(cell[:, 1]) << 1) | spread3(cell[:, 2])
    # octahedral direction map (u, v) in [0,1]^2
    an = jnp.abs(d).sum(axis=-1)
    px = d[:, 0] / an
    py = d[:, 1] / an
    ox_ = jnp.where(d[:, 2] < 0, (1 - jnp.abs(py)) * jnp.sign(px), px)
    oy_ = jnp.where(d[:, 2] < 0, (1 - jnp.abs(px)) * jnp.sign(py), py)
    dres = 1 << dir_bits
    qu = jnp.clip(((ox_ + 1) * 0.5 * dres).astype(jnp.int32), 0, dres - 1)
    qv = jnp.clip(((oy_ + 1) * 0.5 * dres).astype(jnp.int32), 0, dres - 1)
    dm = (spread2(qu) << 1) | spread2(qv)
    return (m << (2 * dir_bits)) | dm


@partial(jax.jit, static_argnames=("interpret", "k"))
def occluded_blocklist_raw(bl: BlockList, o, d, tmax, interpret: bool = False,
                           k: int = MAX_CAND):
    """Any-hit occlusion query: True where some triangle lies within
    (EPS_T, tmax).  Terminates each ray at its first hit (the kernel kills
    the ray's AABB gates), so shadow waves cost far less than closest-hit."""
    n = o.shape[0]
    o_p, d_p, t_p, _ = _pad_rays(o, d, tmax)
    out = _run_kernel(bl, o_p, d_p, t_p, k=k, interpret=interpret, any_hit=True)
    return out[1, :n] > 0.0


def occluded_blocklist_sorted(bl: BlockList, o, d, tmax):
    """Morton-sorted any-hit query (shadow rays)."""
    n = o.shape[0]
    perm = jnp.argsort(_ray_sort_keys(bl, o, d))
    occ = occluded_blocklist_raw(bl, o[perm], d[perm], tmax[perm])
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
    return occ[inv]


def intersect_blocklist_sorted(bl: BlockList, o, d, tmax):
    """Morton-sort rays, intersect, scatter back to ray order."""
    n = o.shape[0]
    perm = jnp.argsort(_ray_sort_keys(bl, o, d))
    t, prim, u, v, valid = intersect_blocklist_raw(bl, o[perm], d[perm], tmax[perm])
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
    return t[inv], prim[inv], u[inv], v[inv], valid[inv]
