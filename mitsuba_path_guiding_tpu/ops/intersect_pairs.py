"""Pair-expansion intersector: per-ray (ray, block) work lists executed
as block-major dense Moeller-Trumbore tiles.

The round-3 large-scene TPU path replacing the per-ray-tile union lists
of ops/intersect_blocklist.py.  Round-2 measurements showed the tile
kernel's per-128-ray-subtile block unions run ~105 block visits while a
single ray needs only ~4.6 (bounce waves, leaf=128) — a ~23x dense-test
waste that per-ray lists eliminate.  Reference bar: per-ray SIMD-packet
kd-tree descent (/root/reference/include/mitsuba/render/gkdtree.h,
triaccel_sse.h).

Pipeline (all XLA — sorts/gathers/dense math; no scalar control flow):

  1. sb candidates  — exact per-ray slab tests against all S superblock
     AABBs in (S, N) layout, packed into monotonic (entry-distance |
     id) keys; the KSB+1 nearest extracted by iterative min (measured
     0.7 ms at S=88, N=524k — cheaper than top_k).
  2. block lists    — for each candidate slot, gather the superblock's
     32 block boxes and slab-test per ray -> (KSB*32, N) packed keys;
     the L+1 nearest blocks per ray extracted the same way.  The
     (L+1)-th key is the DROPPED bound used for the completeness proof.
  3. pair sort      — the (L, N) slots flatten to (ray, block) pairs
     sorted by block id (XLA sort).  128 sentinel "dummy" pairs per
     block guarantee every 128-pair tile contains real pairs of at most
     ONE block (the MoE capacity-padding trick), so each tile gathers
     exactly one triangle record.
  4. MXU Pluecker   — each tile is ONE (16, 128 pairs) x (16, 640) f32
     matmul on the systolic array (3 edge-Pluecker side tests + plane
     num/den per triangle — MT's bilinear cross products factored into
     inner products) + a short VPU epilogue (sign test, t = num/den,
     min-reduce).  Round-4 redesign: the round-3 dense VPU MT ran ~50
     of the ~60 flops per test on the VPU; the matmul moves them to
     the MXU.  Winners are re-evaluated with exact classic MT outside
     the kernel (bit-compatible t/u/v with the brute oracle; rejected
     winners fall back via proven=False).
  5. un-sort        — second key sort returns per-pair (t, prim) to
     (L, N) ray-major slots; min over L gives the per-ray hit.

Correctness: lists are exact per-ray slab results capped at the L
nearest blocks.  A ray is PROVEN complete when its best hit lies closer
than the entry distance of its first dropped candidate (ordered-descent
guarantee, conservative in the truncated key space); unproven rays are
routed through the blocklist kernel fallback by the caller.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mitsuba_path_guiding_tpu.accel.pairs import PairTable

INF = 3.0e38
EPS_T = 1e-4
IMAX = 0x7FFFFFFF
# MEASUREMENT-ONLY knob (round-5 A/B for the NEXT.md bf16-pair-data
# lever): PAIR_DATA_BF16=1 gathers the per-pair ray rows as bfloat16 —
# halving the dominant (7, P) gather traffic — and widens the kernel's
# inside tests by a fixed slack so quantization-shifted candidates are
# still admitted; the exact f32 winner re-evaluation keeps confirmed
# hits bit-exact and routes slack-admitted impostors to the fallback.
#
# MEASURED (tools/ab_bf16_pairs.py, door_room 512^2 depth-5): DEAD END
# in this naive form — 3.08 vs 4.75 Mrays/s (-35%) and an 18% rel image
# error.  bf16 on the ray ORIGIN carries ~0.4% of |o| absolute error
# (~0.01 units here) while the 244k-tri scene's triangles are that size
# themselves, so u/v shift past any fixed slack: true hits are lost
# (image mean 0.52 -> 0.42) and the slack-admitted impostors flood the
# winner-reject fallback (the slowdown).  A viable bf16 scheme needs
# per-tile RE-CENTERED origins (subtract the block AABB center in f32,
# quantize the small residual) — round-6 material.  Closest-hit only —
# any_hit (shadow proofs) always stays f32, a false occluder/leak there
# has no re-evaluation to catch it.
PAIR_DATA_BF16 = os.environ.get("PAIR_DATA_BF16", "0") == "1"
BF16_SLACK = 0.02
PAIR_KSB = 8   # superblock candidate slots per ray
PAIR_L = 8     # block pair slots per ray
PRE_SLOT = 4   # per-slot nearest blocks kept before the global extract
TILE = 128     # pairs per dense MT tile (256 measured neutral on real
#                pairs but doubles the N-independent dummy entries)
LEAF = 128     # triangles per block (tri_rows trailing dim)


def _pack_key(tn, idx):
    """Monotonic (entry-distance | id) packing: top-16 bits of the
    non-negative f32 distance (rounds DOWN — conservative), id in the
    low 16.  Positive-f32 bit patterns sort like the floats."""
    b = jax.lax.bitcast_convert_type(tn.astype(jnp.float32), jnp.int32)
    return jnp.bitwise_or(jnp.bitwise_and(b, jnp.int32(-65536)),
                          idx.astype(jnp.int32))


def _slab_keys(lo, hi, o, d, tmax, ids):
    """Packed entry keys (M, N) for rays vs M AABBs; IMAX on miss.

    lo/hi (M, 3); o/d (N, 3); tmax (N,); ids (M,) int32 < 65536.
    Component-major math — every intermediate is (M, N) with the big
    ray axis in lanes."""
    tn = jnp.zeros((lo.shape[0], o.shape[0]), jnp.float32)
    tf = jnp.full_like(tn, INF)
    for a in range(3):
        da = d[:, a][None, :]
        oa = o[:, a][None, :]
        parallel = jnp.abs(da) < 1e-12
        inv = 1.0 / jnp.where(parallel, 1.0, da)
        t0 = (lo[:, a][:, None] - oa) * inv
        t1 = (hi[:, a][:, None] - oa) * inv
        lo_t = jnp.minimum(t0, t1)
        hi_t = jnp.maximum(t0, t1)
        inside = (oa >= lo[:, a][:, None]) & (oa <= hi[:, a][:, None])
        lo_t = jnp.where(parallel, jnp.where(inside, 0.0, INF), lo_t)
        hi_t = jnp.where(parallel, jnp.where(inside, INF, -INF), hi_t)
        tn = jnp.maximum(tn, lo_t)
        tf = jnp.minimum(tf, hi_t)
    tn = jnp.maximum(tn, 0.0)  # keep packed keys in positive-f32 space
    hit = (tf >= tn) & (tn <= tmax[None, :])
    return jnp.where(hit, _pack_key(tn, ids[:, None]), jnp.int32(IMAX))


def _extract_min(keys, k):
    """k ascending minima along axis 0 of unique int32 keys (M, N) ->
    (k, N).  Iterative min + equality masking (keys are unique per ray
    because the id lives in the low bits)."""
    outs = []
    for _ in range(k):
        m = jnp.min(keys, axis=0)
        outs.append(m)
        keys = jnp.where(keys == m[None, :], jnp.int32(IMAX), keys)
    return jnp.stack(outs)


def build_pair_lists(pt: PairTable, o, d, tmax, ksb: int = PAIR_KSB,
                     l_blk: int = PAIR_L):
    """Stages 1-2: per-ray nearest-L block lists.

    Returns (blk_ids (L, N) int32 [-1 = empty slot], dropped_key (N,)
    int32 — the packed entry bound of the first candidate NOT in the
    list; IMAX when the list is complete)."""
    n = o.shape[0]
    s = pt.sb_lo.shape[0]
    sb_ids = jnp.arange(s, dtype=jnp.int32)
    sb_keys = _slab_keys(pt.sb_lo, pt.sb_hi, o, d, tmax, sb_ids)
    # barrier: sb_min feeds 8+ consumers below; without it XLA's fusion
    # re-materializes the whole (S, N) slab + 9-pass extraction chain per
    # consumer (measured 72 ms for stage 1+2 vs 8 ms with the barrier)
    sb_min = jax.lax.optimization_barrier(
        _extract_min(sb_keys, ksb + 1)
    )                                                 # (ksb+1, N)
    sb_dropped = sb_min[ksb]                          # (N,)

    # Per candidate slot: select the sb's 32 block boxes via a one-hot
    # MXU matmul — (SB_BLK*6, S) bf16 table x (S, N) one-hot -> (192, N)
    # lands directly in ray-lanes layout.  A gather would produce
    # (N, 192) and need a real transpose (measured ~6.5 ms/slot once the
    # layout is forced; the matmul select is ~0.4 ms/slot).  One-hot
    # products are exact; the table is outward-rounded to bf16 at build
    # time so the boxes stay conservative.
    nb = pt.sb_blk
    iota_s = jnp.arange(s, dtype=jnp.int32)[:, None]

    key_rows = []
    for k in range(ksb):
        slot = sb_min[k]
        slot_valid = slot != IMAX
        sid = jnp.where(slot_valid, jnp.bitwise_and(slot, 0xFFFF), -1)
        oh = (sid[None, :] == iota_s).astype(jnp.bfloat16)   # (S, N)
        gt = jnp.dot(
            pt.tblT, oh, preferred_element_type=jnp.float32
        ).reshape(nb, 6, n)                                   # (nb, 6, N)
        tn = jnp.zeros((nb, n), jnp.float32)
        tf = jnp.full((nb, n), INF)
        for a in range(3):
            da = d[:, a][None, :]
            oa = o[:, a][None, :]
            parallel = jnp.abs(da) < 1e-12
            inv = 1.0 / jnp.where(parallel, 1.0, da)
            t0 = (gt[:, a, :] - oa) * inv
            t1 = (gt[:, 3 + a, :] - oa) * inv
            lo_t = jnp.minimum(t0, t1)
            hi_t = jnp.maximum(t0, t1)
            inside = (oa >= gt[:, a, :]) & (oa <= gt[:, 3 + a, :])
            lo_t = jnp.where(parallel, jnp.where(inside, 0.0, INF), lo_t)
            hi_t = jnp.where(parallel, jnp.where(inside, INF, -INF), hi_t)
            tn = jnp.maximum(tn, lo_t)
            tf = jnp.minimum(tf, hi_t)
        tn = jnp.maximum(tn, 0.0)
        hit = (tf >= tn) & (tn <= tmax[None, :]) & slot_valid[None, :]
        gids = jnp.maximum(sid[None, :], 0) * nb + jnp.arange(
            nb, dtype=jnp.int32
        )[:, None]
        keys_k = jnp.where(hit, _pack_key(tn, gids), jnp.int32(IMAX))
        # per-slot pre-extraction: keep each slot's PRE+1 nearest blocks
        # plus the slot's own dropped bound.  The final global extraction
        # then scans (ksb*(PRE+1), N) instead of (ksb*nb, N) — the 9-pass
        # full scan was ~5 ms of pure key re-reads at 524k rays.  Blocks
        # beyond a slot's PRE nearest fold into the dropped bound, which
        # only weakens the completeness proof, never correctness.
        key_rows.append(_extract_min(keys_k, PRE_SLOT + 1))
    pre = jnp.concatenate(key_rows, axis=0)  # (ksb*(PRE+1), N)
    # rows PRE_SLOT of each slot block are that slot's dropped bound
    per_slot_dropped = pre.reshape(ksb, PRE_SLOT + 1, n)[:, PRE_SLOT, :]
    kept = pre.reshape(ksb, PRE_SLOT + 1, n)[:, :PRE_SLOT, :].reshape(
        ksb * PRE_SLOT, n
    )
    blk_min = jax.lax.optimization_barrier(
        _extract_min(kept, l_blk + 1)
    )                                                 # (l+1, N)
    blk_dropped = jnp.minimum(
        blk_min[l_blk], jnp.min(per_slot_dropped, axis=0)
    )
    dropped = jnp.minimum(sb_dropped, blk_dropped)
    ids = jnp.where(
        blk_min[:l_blk] == IMAX, -1,
        jnp.bitwise_and(blk_min[:l_blk], 0xFFFF),
    )
    return ids, dropped


def _mt_pallas_kernel(tile_block_ref, tri_ref, pd_ref, out_ref,
                      any_hit=False, loose=False):
    """One 128-pair tile: dense (128 tris x 128 pairs) Moeller-Trumbore.

    tri_ref (1, 10, 128) is auto-DMA'd by the BlockSpec index map from
    the prefetched per-tile block id (Pallas skips the fetch when
    consecutive tiles index the same block); pd_ref (7, 128) carries
    o/d/tmax per pair.  Inert tiles (block < 0: dummy padding or sort
    tail) skip the dense math entirely — the tail of the capacity-padded
    sort costs nothing, unlike the pure-XLA formulation."""
    i = pl.program_id(0)
    inert = tile_block_ref[i] < 0

    tile = out_ref.shape[1]

    @pl.when(inert)
    def _():
        out_ref[0, :] = jnp.full((tile,), INF)
        out_ref[1, :] = jnp.full((tile,), -1.0)

    @pl.when(jnp.logical_not(inert))
    def _():
        def tcol(c):
            return tri_ref[0, c, :][:, None]          # (128tri, 1)

        def rrow(c):
            r = pd_ref[c, :][None, :]                 # (1, 128pair)
            # bf16 pair data (PAIR_DATA_BF16): upcast once in VMEM
            return r.astype(jnp.float32) if loose else r

        p0x, p0y, p0z = tcol(0), tcol(1), tcol(2)
        e1x, e1y, e1z = tcol(3), tcol(4), tcol(5)
        e2x, e2y, e2z = tcol(6), tcol(7), tcol(8)
        tid = tcol(9)
        ox, oy, oz = rrow(0), rrow(1), rrow(2)
        dx, dy, dz = rrow(3), rrow(4), rrow(5)
        tmax = rrow(6)

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
        # bf16 pair data: widen the inside tests so quantization-shifted
        # candidates stay admitted — the exact f32 winner re-evaluation
        # outside the kernel rejects impostors (fallback re-traces them)
        eps_in = BF16_SLACK if loose else 0.0
        t_hi = tmax * (1.0 + eps_in) if loose else tmax
        hit = (
            (inv_det != 0.0)
            & (u >= -eps_in)
            & (v >= -eps_in)
            & (u + v <= 1.0 + eps_in)
            & (t > EPS_T * (1.0 - eps_in))
            & (t < t_hi)
            & (tid >= 0.0)
        )
        t = jnp.where(hit, t, INF)
        t_best = jnp.min(t, axis=0)
        out_ref[0, :] = t_best
        if any_hit:
            out_ref[1, :] = jnp.where(t_best < INF, 1.0, -1.0)
        else:
            big = jnp.float32(2.0e9)
            is_best = t == t_best[None, :]
            prim = jnp.min(jnp.where(is_best, tid, big), axis=0)
            out_ref[1, :] = jnp.where(t_best < INF, prim, -1.0)


def _mt_tiles_pallas(tri_rows, tile_block, pdata_tiles, any_hit,
                     interpret=False):
    """Pallas stage 4.  tri_rows (B, 10, 128); tile_block (T,) int32;
    pdata_tiles (7, T*128).  Returns (2, T*128) rows t/prim (u/v of the
    winner are re-evaluated exactly outside the kernel)."""
    n_tiles = tile_block.shape[0]
    tile = pdata_tiles.shape[1] // n_tiles
    bmax = tri_rows.shape[0] - 1
    out = pl.pallas_call(
        partial(_mt_pallas_kernel, any_hit=any_hit,
                loose=(pdata_tiles.dtype == jnp.bfloat16)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1, 10, LEAF),
                    # clamp both ends: an out-of-range id would DMA out of
                    # bounds and abort the TPU
                    lambda i, blk: (jnp.clip(blk[i], 0, bmax), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (7, tile), lambda i, blk: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (2, tile), lambda i, blk: (0, i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((2, n_tiles * tile), jnp.float32),
        interpret=interpret,
    )(tile_block, tri_rows, pdata_tiles)
    return out


def _mt_tiles(tri_rows, tile_block, po, pd, ptmax, any_hit):
    """Stage 4: dense per-tile MT.  tri_rows (B, 10, LEAF=128);
    tile_block (T,); pair data (T, 128) per component.  Returns per-pair
    (t, prim_f, u, v) each (T, 128)."""
    tri = tri_rows[jnp.maximum(tile_block, 0)]        # (T, 10, 128)

    def tcol(c):
        return tri[:, c, :][:, :, None]               # (T, 128tri, 1)

    def rrow(x):
        return x[:, None, :]                          # (T, 1, 128pair)

    p0x, p0y, p0z = tcol(0), tcol(1), tcol(2)
    e1x, e1y, e1z = tcol(3), tcol(4), tcol(5)
    e2x, e2y, e2z = tcol(6), tcol(7), tcol(8)
    tid = tri[:, 9, :][:, :, None]
    ox, oy, oz = rrow(po[0]), rrow(po[1]), rrow(po[2])
    dx, dy, dz = rrow(pd[0]), rrow(pd[1]), rrow(pd[2])

    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = jnp.where(
        jnp.abs(det) < 1e-12, 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det)
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
        & (t < rrow(ptmax))
        & (tid >= 0.0)
    )
    t = jnp.where(hit, t, INF)
    t_best = jnp.min(t, axis=1)                       # (T, 128)
    if any_hit:
        return t_best, None
    big = jnp.float32(2.0e9)
    is_best = t == t_best[:, None, :]
    prim = jnp.min(jnp.where(is_best, tid, big), axis=1)
    return t_best, prim


# sign-test slack for the closest-hit Pluecker inside test, relative to
# the side-value magnitudes: boundary hits the matmul rounds the other
# way from exact MT are admitted as candidates and settled by the exact
# winner re-evaluation (false admissions that survive to the winner are
# rejected there and routed to the fallback via proven=False)
PLK_EPS = 1e-6


def _plk_epilogue(out5, tid, tmax, any_hit, tri_axis):
    """Shared Pluecker epilogue: out5 holds the 5 matmul result groups
    [s0, s1, s2, num, den] (each (..., LEAF) with triangles on
    ``tri_axis``), tid broadcastable to a group.  Returns (t_best,
    prim_f) reduced over the triangle axis."""
    s0, s1, s2, num, den = out5
    smin = jnp.minimum(jnp.minimum(s0, s1), s2)
    smax = jnp.maximum(jnp.maximum(s0, s1), s2)
    if any_hit:
        inside = (smin >= 0.0) | (smax <= 0.0)
    else:
        eps = PLK_EPS * (jnp.abs(s0) + jnp.abs(s1) + jnp.abs(s2))
        inside = (smin >= -eps) | (smax <= eps)
    ok_den = den != 0.0
    t = num / jnp.where(ok_den, den, 1.0)
    hit = inside & ok_den & (t > EPS_T) & (t < tmax) & (tid >= 0.0)
    t = jnp.where(hit, t, INF)
    t_best = jnp.min(t, axis=tri_axis)
    if any_hit:
        return t_best, jnp.where(t_best < INF, 1.0, -1.0)
    big = jnp.float32(2.0e9)
    is_best = t == jnp.expand_dims(t_best, tri_axis)
    prim = jnp.min(jnp.where(is_best, tid + jnp.zeros_like(t), big),
                   axis=tri_axis)
    return t_best, jnp.where(t_best < INF, prim, -1.0)


def _plk_pallas_kernel(tile_block_ref, tri_cols_ref, tri_rows_ref, pd_ref,
                       out_ref, any_hit=False):
    """One 128-pair tile on the MXU: intersection as ONE f32 matmul.

    The per-(pair, triangle) Moeller-Trumbore cross products are
    bilinear in (ray, triangle), so they factor into an inner product:
    ray features F = [d, o x d, o, 1, 0pad] (16) against 5 precomputed
    triangle columns (3 edge-Pluecker side tests s_i = d.(a x b) +
    (b-a).(o x d), plane numerator n.(v0-o), denominator n.d).  The
    (16, 128 pairs) x (16, 640 cols) dot runs on the systolic array
    (~50 of the ~60 flops per test), leaving the VPU a short epilogue:
    sign-consistency inside test, t = num/den, range checks, min-reduce.
    Exact u/v/t for the winning primitive are re-evaluated OUTSIDE the
    kernel by classic MT (intersect_pairs_raw), so the kernel returns
    only (t, prim).

    tri_cols (1, 16, 5*LEAF) is auto-DMA'd from the prefetched per-tile
    block id; inert tiles (block < 0) skip everything."""
    i = pl.program_id(0)
    inert = tile_block_ref[i] < 0
    tile = out_ref.shape[1]

    @pl.when(inert)
    def _():
        out_ref[0, :] = jnp.full((tile,), INF)
        out_ref[1, :] = jnp.full((tile,), -1.0)

    @pl.when(jnp.logical_not(inert))
    def _():
        acc = jax.lax.dot_general(
            pd_ref[...], tri_cols_ref[0],
            (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                             # (tile, 5*LEAF)
        groups = tuple(
            acc[:, g * LEAF:(g + 1) * LEAF] for g in range(5)
        )
        tid = tri_rows_ref[0, 9, :][None, :]
        tmax = pd_ref[10, :][:, None]
        t_best, prim = _plk_epilogue(groups, tid, tmax, any_hit,
                                     tri_axis=1)
        out_ref[0, :] = t_best
        out_ref[1, :] = prim


def _plk_tiles_pallas(tri_cols, tri_rows, tile_block, pd16_tiles, any_hit,
                      interpret=False):
    """Pallas stage 4.  tri_cols (B, 16, 5*LEAF); tri_rows (B, 10, LEAF);
    tile_block (T,) int32; pd16_tiles (16, T*tile).  Returns (2, T*tile)
    rows t/prim."""
    n_tiles = tile_block.shape[0]
    tile = pd16_tiles.shape[1] // n_tiles
    bmax = tri_rows.shape[0] - 1
    out = pl.pallas_call(
        partial(_plk_pallas_kernel, any_hit=any_hit),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1, 16, 5 * LEAF),
                    # clamp both ends: an out-of-range id would DMA out of
                    # bounds and abort the TPU
                    lambda i, blk: (jnp.clip(blk[i], 0, bmax), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 10, LEAF),
                    lambda i, blk: (jnp.clip(blk[i], 0, bmax), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (16, tile), lambda i, blk: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (2, tile), lambda i, blk: (0, i), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((2, n_tiles * tile), jnp.float32),
        interpret=interpret,
    )(tile_block, tri_cols, tri_rows, pd16_tiles)
    return out


def _plk_tiles(tri_cols, tri_rows, tile_block, pd16_tiles, any_hit):
    """XLA stage 4 (CPU tests / interpret): same Pluecker math as the
    Pallas kernel, batched over tiles.  pd16_tiles (T, tile, 16)."""
    C = tri_cols[jnp.maximum(tile_block, 0)]          # (T, 16, 5L)
    acc = jnp.einsum(
        "tpf,tfc->tpc", pd16_tiles, C,
        precision=jax.lax.Precision.HIGHEST,
    )                                                 # (T, tile, 5L)
    groups = tuple(
        acc[:, :, g * LEAF:(g + 1) * LEAF] for g in range(5)
    )
    tid = tri_rows[jnp.maximum(tile_block, 0), 9, :][:, None, :]
    tmax = pd16_tiles[:, :, 10][:, :, None]
    t_best, prim = _plk_epilogue(groups, tid, tmax, any_hit, tri_axis=2)
    # inert tiles (dummy/tail)
    inert = (tile_block < 0)[:, None]
    t_best = jnp.where(inert, INF, t_best)
    prim = jnp.where(inert, -1.0, prim)
    return t_best, prim


def _mt_exact_winner(pt: PairTable, prim, o, d, tmax):
    """Exact Moeller-Trumbore re-evaluation of each ray's winning
    primitive: returns (t, u, v, ok).  Keeps the reported t/u/v bitwise
    in classic-MT arithmetic (matching the brute oracle and the fallback
    kernel); a Pluecker winner the exact test rejects is routed to the
    fallback by the caller via proven=False."""
    loc = pt.prim_loc[jnp.clip(prim, 0, pt.prim_loc.shape[0] - 1)]
    rows = pt.tri_flat[loc]                           # ONE (N, 10) gather
    p0 = rows[:, 0:3]
    e1 = rows[:, 3:6]
    e2 = rows[:, 6:9]
    pv = jnp.cross(d, e2)
    det = jnp.sum(e1 * pv, axis=-1)
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0,
                        1.0 / jnp.where(det == 0.0, 1.0, det))
    tv = o - p0
    u = jnp.sum(tv * pv, axis=-1) * inv_det
    qv = jnp.cross(tv, e1)
    v = jnp.sum(d * qv, axis=-1) * inv_det
    t = jnp.sum(e2 * qv, axis=-1) * inv_det
    ok = (
        (inv_det != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > EPS_T) & (t < tmax)
    )
    return t, u, v, ok


@partial(jax.jit, static_argnames=("ksb", "l_blk", "any_hit", "use_pallas",
                                   "cap_factor", "engine"))
def intersect_pairs_raw(pt: PairTable, o, d, tmax, ksb: int = PAIR_KSB,
                        l_blk: int = PAIR_L, any_hit: bool = False,
                        use_pallas: bool = True,
                        cap_factor: int | None = None,
                        engine: str = "mt"):
    """Closest-hit (or any-hit) through the pair pipeline.

    Returns (t, prim int32, u, v, valid, proven) — ``proven`` False
    marks rays whose nearest-L list was incomplete AND whose best hit
    does not bound the dropped candidates; the caller must re-trace
    those through a fallback path.

    ``cap_factor``: static pair-compaction budget.  The sorted pair
    array is N*l_blk + dummies long, but only ~2.1 slots/ray are VALID
    on bounce waves (NEXT.md) — the IMAX tail is pure overhead for the
    kernel grid and the pair-data gathers.  With cap_factor=c the
    post-sort pipeline processes only the first c*N + dummies entries;
    any ray whose candidate list reaches a block at or past the cut is
    conservatively marked unproven (its pairs may have been dropped)
    and re-traced by the caller's fallback.  None = no compaction.

    ``engine``: "mt" (dense VPU Moeller-Trumbore tiles, round-3 kernel —
    measured faster at TILE=128 where per-tile fixed costs dominate) or
    "plk" (MXU Pluecker matmul tiles + exact winner re-evaluation)."""
    n = o.shape[0]
    leaf = pt.tri_rows.shape[2]
    assert leaf == LEAF, "pair MT expects LEAF == 128"

    ids, dropped = build_pair_lists(pt, o, d, tmax, ksb=ksb, l_blk=l_blk)

    # ---- stage 3: block-major sort with per-block dummy padding
    flat_blk = ids.reshape(-1)                        # (L*N,)
    valid = flat_blk >= 0
    sort_key = jnp.where(valid, flat_blk * 2, jnp.int32(IMAX))
    # payloads stay the flat index even for EMPTY slots so the un-sort
    # restores every (l, ray) slot (empty slots produce inert results);
    # only dummies carry IMAX and fall off the end
    payload = jnp.arange(flat_blk.shape[0], dtype=jnp.int32)
    # dummies only for blocks that hold triangles: empty padding blocks
    # can never appear in a candidate list, so they need no run separator
    dummy_key = jnp.repeat(pt.nonempty, TILE) * 2 + 1
    n_dummy = dummy_key.shape[0]
    # pad to a TILE multiple (tiny N under shard_map: N*L may be < TILE)
    tail = (-(flat_blk.shape[0] + n_dummy)) % TILE
    keys = jnp.concatenate(
        [sort_key, dummy_key, jnp.full((tail,), jnp.int32(IMAX))]
    )
    pays = jnp.concatenate(
        [payload, jnp.full((n_dummy + tail,), jnp.int32(IMAX))]
    )
    skeys, spays = jax.lax.sort((keys, pays), num_keys=1)

    # ---- static compaction: run the kernel + gathers on a prefix only.
    # The cut tail of the SORTED order still participates in the
    # un-sort (its original payloads, with inert miss results), so the
    # payload domain stays complete; rays whose lists reach a block at
    # or past the cut are conservatively unproven (fallback re-traces).
    p_full = skeys.shape[0]
    spays_full = spays
    cut_rays = None
    if cap_factor is not None:
        p_cap = cap_factor * n + n_dummy
        p_cap = min(((p_cap + TILE - 1) // TILE) * TILE, p_full)
        if p_cap < p_full:
            cut_key = skeys[p_cap]
            cut_blk = jnp.where(cut_key == IMAX, jnp.int32(IMAX),
                                cut_key // 2)
            cut_rays = jnp.any((ids >= 0) & (ids >= cut_blk), axis=0)
            skeys = skeys[:p_cap]
            spays = spays[:p_cap]

    # ---- pair data gathers (ray-major source, component rows)
    is_real = (skeys != IMAX) & (skeys % 2 == 0)      # real pair, not dummy
    ray_idx = jnp.where(spays != IMAX, spays % n, 0)
    comp = jnp.concatenate([o.T, d.T, tmax[None, :]], axis=0)  # (7, N)
    bf16_pairs = PAIR_DATA_BF16 and not any_hit and engine == "mt" \
        and use_pallas
    if bf16_pairs:
        comp = comp.astype(jnp.bfloat16)
    pdata = comp[:, ray_idx]                          # (7, P)
    # dead pair lanes must not hit anything
    ptm = jnp.where(is_real, pdata[6], jnp.zeros((), pdata.dtype))

    n_tiles = skeys.shape[0] // TILE
    tk = skeys.reshape(n_tiles, TILE)
    tile_block = jnp.max(
        jnp.where((tk != IMAX) & (tk % 2 == 0), tk // 2, -1), axis=1
    )
    if engine == "plk":
        # 16-row Pluecker ray features [d, o x d, o, 1, tmax, 0pad] built
        # AFTER the gather (the cross is 6 VPU ops/pair — cheaper than
        # gathering 9 extra precomputed rows per pair)
        po_, pd_ = pdata[0:3], pdata[3:6]
        m0 = po_[1] * pd_[2] - po_[2] * pd_[1]
        m1 = po_[2] * pd_[0] - po_[0] * pd_[2]
        m2 = po_[0] * pd_[1] - po_[1] * pd_[0]
        p_cnt = ptm.shape[0]
        ones = jnp.ones((1, p_cnt), jnp.float32)
        zeros = jnp.zeros((5, p_cnt), jnp.float32)
        pd16 = jnp.concatenate(
            [pd_, jnp.stack([m0, m1, m2]), po_, ones, ptm[None, :], zeros],
            axis=0,
        )                                             # (16, P)
        if use_pallas:
            outp = _plk_tiles_pallas(pt.tri_cols, pt.tri_rows, tile_block,
                                     pd16, any_hit)
            res = (outp[0], outp[1])
        else:
            pd16_t = pd16.T.reshape(n_tiles, TILE, 16)
            t_b, prim_b = _plk_tiles(pt.tri_cols, pt.tri_rows, tile_block,
                                     pd16_t, any_hit)
            res = (t_b.reshape(-1), prim_b.reshape(-1))
    else:
        if use_pallas:
            pdt = jnp.concatenate([pdata[0:6], ptm[None, :]], axis=0)
            outp = _mt_tiles_pallas(pt.tri_rows, tile_block, pdt, any_hit)
            res = (outp[0], outp[1])
        else:
            po = pdata[0:3].reshape(3, n_tiles, TILE)
            pdir = pdata[3:6].reshape(3, n_tiles, TILE)
            ptm_t = ptm.reshape(n_tiles, TILE)
            t_b, prim_b = _mt_tiles(
                pt.tri_rows, tile_block, po, pdir, ptm_t, any_hit
            )
            res = (t_b.reshape(-1),) if any_hit else (
                t_b.reshape(-1), prim_b.reshape(-1))
    if res[0].shape[0] < p_full:
        # pad results back to the full sorted order: cut pairs read as
        # misses against their ORIGINAL payloads (spays_full)
        pad = p_full - res[0].shape[0]
        fills = (INF, -1.0, 0.0, 0.0)
        res = tuple(
            jnp.concatenate([r, jnp.full((pad,), fills[i])])
            for i, r in enumerate(res)
        )

    # ---- stage 5: un-sort to (L, N) ray-major slots, reduce per ray
    ln = l_blk * n
    if any_hit:
        back = jax.lax.sort((spays_full, res[0]), num_keys=1)
        t_ray = back[1][:ln].reshape(l_blk, n)
        occ = jnp.any(t_ray < INF, axis=0)
        # proof for any-hit: an occluder found anywhere suffices; a miss
        # is proven only when nothing was dropped closer than tmax
        tmax_key = jnp.bitwise_and(
            jax.lax.bitcast_convert_type(
                jnp.maximum(tmax, 0.0).astype(jnp.float32), jnp.int32
            ),
            jnp.int32(-65536),
        )
        proven = occ | (dropped >= tmax_key)
        if cut_rays is not None:
            # a found occluder stands regardless of cut pairs; a miss
            # does not
            proven = occ | (proven & ~cut_rays)
        return occ, proven

    back = jax.lax.sort((spays_full, res[0], res[1]), num_keys=1)
    t_ray = back[1][:ln].reshape(l_blk, n)
    prim_ray = back[2][:ln].reshape(l_blk, n)
    t_best = jnp.min(t_ray, axis=0)
    is_b = t_ray == t_best[None, :]
    big = jnp.float32(2.0e9)
    prim_best = jnp.min(jnp.where(is_b, prim_ray, big), axis=0)
    hit_valid = t_best < INF
    prim_i = jnp.where(hit_valid, prim_best, -1.0).astype(jnp.int32)

    # exact winner re-evaluation: classic MT on the winning primitive
    # gives bit-compatible t/u/v with the brute oracle + fallback kernel
    # from ONE (N, 10) row gather (in-kernel u/v selection cost two extra
    # back-sort operands, ~4 ms/call at 2.4M pairs).  A winner the exact
    # test rejects (plk loose inside-eps admission; never for mt) is NOT
    # proven — the fallback re-traces it.
    t_ex, u_ex, v_ex, ok_ex = _mt_exact_winner(pt, prim_i, o, d, tmax)
    confirmed = hit_valid & ok_ex
    t_fin = jnp.where(confirmed, t_ex, INF)
    u_best = jnp.where(confirmed, u_ex, 0.0)
    v_best = jnp.where(confirmed, v_ex, 0.0)
    not_ok = hit_valid & ~ok_ex
    prim_fin = jnp.where(confirmed, prim_i, -1).astype(jnp.int32)

    # completeness proof: best hit at or before the first dropped
    # candidate's (rounded-down) entry distance — or nothing dropped
    t_key = jnp.bitwise_and(
        jax.lax.bitcast_convert_type(t_fin, jnp.int32),
        jnp.int32(-65536),
    )
    proven = (t_key <= jnp.bitwise_and(dropped, jnp.int32(-65536))) \
        & ~not_ok
    if cut_rays is not None:
        proven = proven & ~cut_rays
    return (t_fin, prim_fin, u_best, v_best, confirmed, proven)
