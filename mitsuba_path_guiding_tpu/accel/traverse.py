"""Ray-scene intersection: Moeller-Trumbore + stack-based BVH traversal.

Replaces the reference's kd-tree traversal hot loop
(/root/reference/include/mitsuba/render/skdtree.h, triaccel.h SSE packets)
with a vmapped ``lax.while_loop`` over a fixed-depth traversal stack —
XLA maps the vmap onto VPU lanes; the node arrays stay device-resident.
A brute-force all-triangles path doubles as the test oracle
(reference test_kd.cpp brute-force comparison, SURVEY.md §4) and as the
fastest path for tiny scenes (fully dense, MXU/VPU-friendly).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.math import cross, dot, safe_rcp
from mitsuba_path_guiding_tpu.scene.types import BVH, Geometry

INF = jnp.float32(3.0e38)
EPS_T = 1e-4  # min ray t (self-intersection offset, reference ShadowEpsilon)
STACK_SIZE = 48  # static traversal stack depth bound


class Hit(NamedTuple):
    t: jnp.ndarray       # (N,) hit distance (INF if miss)
    prim: jnp.ndarray    # (N,) int32 triangle index (-1 if miss)
    u: jnp.ndarray       # (N,) barycentric
    v: jnp.ndarray       # (N,)
    valid: jnp.ndarray   # (N,) bool


def moeller_trumbore(o, d, p0, e1, e2, tmin, tmax):
    """Batched Moeller-Trumbore. All args broadcast; returns (t, u, v, hit)."""
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    inv_det = safe_rcp(det)
    tvec = o - p0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(d, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin)
        & (t < tmax)
    )
    return t, u, v, hit


def _mt_components(geo: Geometry, o, d):
    """Scalarized Moeller-Trumbore over all triangles.

    Layout note (TPU): all intermediates are (T, N) with the big ray axis
    last — a trailing axis of 3 would be padded to 128 lanes by the TPU
    tiler (~42x wasted HBM traffic), which made the naive (N, T, 3)
    formulation ~20x slower.  Returns (t, u, v, hit_mask) each (T, N).
    """
    ox, oy, oz = o[:, 0][None, :], o[:, 1][None, :], o[:, 2][None, :]
    dx, dy, dz = d[:, 0][None, :], d[:, 1][None, :], d[:, 2][None, :]
    p0x, p0y, p0z = (geo.p0[:, k][:, None] for k in range(3))
    e1x, e1y, e1z = (geo.e1[:, k][:, None] for k in range(3))
    e2x, e2y, e2z = (geo.e2[:, k][:, None] for k in range(3))

    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))
    tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    hit = (inv_det != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > EPS_T)
    return t, u, v, hit


def intersect_brute(geo: Geometry, o, d, tmax=None) -> Hit:
    """O(N*T) dense intersection — oracle + small-scene fast path."""
    n = o.shape[0]
    if tmax is None:
        tmax = jnp.full((n,), INF)
    t, u, v, hit = _mt_components(geo, o, d)
    hit = hit & (t < tmax[None, :])
    t = jnp.where(hit, t, INF)
    # reduce-only winner selection: argmin+per-column gather lowers to a
    # slow generic gather on TPU; min + one-hot select stays pure VPU
    bt = jnp.min(t, axis=0)
    valid = bt < INF
    tcount = t.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    is_best = t == bt[None, :]
    prim = jnp.min(jnp.where(is_best, iota, tcount), axis=0)
    first = is_best & (iota == prim[None, :])
    bu = jnp.sum(jnp.where(first, u, 0.0), axis=0)
    bv = jnp.sum(jnp.where(first, v, 0.0), axis=0)
    return Hit(
        t=bt,
        prim=jnp.where(valid, prim, -1).astype(jnp.int32),
        u=bu,
        v=bv,
        valid=valid,
    )


def occluded_brute(geo: Geometry, o, d, tmax) -> jnp.ndarray:
    """Any-hit visibility without argmin/gather (shadow rays)."""
    t, _, _, hit = _mt_components(geo, o, d)
    return jnp.any(hit & (t < tmax[None, :]), axis=0)


def _ray_aabb(o, inv_d, bmin, bmax, tmax):
    """Slab test; returns (hit, t_near).

    Axes where the ray is parallel to the slab (|inv_d| saturated by
    safe_rcp) are handled by a containment test — otherwise an origin
    exactly on a box face yields t = 0 * 1e20 = 0 and falsely culls."""
    parallel = jnp.abs(inv_d) >= 1e19
    inside = (o >= bmin) & (o <= bmax)
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    lo = jnp.where(parallel, jnp.where(inside, -INF, INF), jnp.minimum(t0, t1))
    hi = jnp.where(parallel, jnp.where(inside, INF, -INF), jnp.maximum(t0, t1))
    tn = jnp.max(lo, axis=-1)
    tf = jnp.min(hi, axis=-1)
    return (tf >= jnp.maximum(tn, 0.0)) & (tn <= tmax), tn


@partial(jax.jit, static_argnames=("any_hit",))
def intersect_bvh(geo: Geometry, bvh: BVH, o, d, tmax=None, any_hit: bool = False) -> Hit:
    """Closest-hit (or any-hit) BVH traversal, vmapped over rays."""
    n = o.shape[0]
    if tmax is None:
        tmax = jnp.full((n,), INF)
    # Static traversal stack bound: SAH builds stay well under this for any
    # realistic scene (checked at build time in scene/builder.py).
    stack_size = STACK_SIZE

    def one_ray(o1, d1, tmax1):
        inv_d = safe_rcp(d1)

        # state: (stack, sp, best_t, best_prim, best_u, best_v)
        stack = jnp.zeros((stack_size,), jnp.int32)
        state = (stack, jnp.int32(1), tmax1, jnp.int32(-1), 0.0, 0.0)

        def cond(s):
            _, sp, _, best_prim, _, _ = s
            alive = sp > 0
            if any_hit:
                alive &= best_prim < 0
            return alive

        def body(s):
            stack, sp, best_t, best_prim, best_u, best_v = s
            sp = sp - 1
            node = stack[sp]
            hit_box, _ = _ray_aabb(o1, inv_d, bvh.node_min[node], bvh.node_max[node], best_t)
            c0 = bvh.child0[node]
            c1 = bvh.child1[node]
            is_leaf = c0 < 0

            # --- leaf: test up to MAX_LEAF prims (static unroll, masked)
            prim_start = -(c0 + 1)
            prim_count = -c1

            def leaf_case(args):
                stack, sp, best_t, best_prim, best_u, best_v = args
                for k in range(4):  # MAX_LEAF
                    pid = bvh.prim_idx[jnp.minimum(prim_start + k, bvh.prim_idx.shape[0] - 1)]
                    t, u, v, h = moeller_trumbore(
                        o1, d1, geo.p0[pid], geo.e1[pid], geo.e2[pid], EPS_T, best_t
                    )
                    take = h & (k < prim_count)
                    best_prim = jnp.where(take, pid, best_prim)
                    best_u = jnp.where(take, u, best_u)
                    best_v = jnp.where(take, v, best_v)
                    best_t = jnp.where(take, t, best_t)
                return stack, sp, best_t, best_prim, best_u, best_v

            def inner_case(args):
                stack, sp, best_t, best_prim, best_u, best_v = args
                # near-child-first ordering by entry distance
                _, tn0 = _ray_aabb(o1, inv_d, bvh.node_min[c0], bvh.node_max[c0], best_t)
                _, tn1 = _ray_aabb(o1, inv_d, bvh.node_min[c1], bvh.node_max[c1], best_t)
                near = jnp.where(tn0 <= tn1, c0, c1)
                far = jnp.where(tn0 <= tn1, c1, c0)
                stack = stack.at[sp].set(far)
                stack = stack.at[sp + 1].set(near)
                return stack, sp + 2, best_t, best_prim, best_u, best_v

            def skip_case(args):
                return args

            args = (stack, sp, best_t, best_prim, best_u, best_v)
            branch = jnp.where(hit_box, jnp.where(is_leaf, 1, 2), 0)
            return jax.lax.switch(branch, [skip_case, leaf_case, inner_case], args)

        _, _, best_t, best_prim, best_u, best_v = jax.lax.while_loop(cond, body, state)
        valid = best_prim >= 0
        return jnp.where(valid, best_t, INF), best_prim, best_u, best_v, valid

    t, prim, u, v, valid = jax.vmap(one_ray)(o, d, tmax)
    return Hit(t=t, prim=prim, u=u, v=v, valid=valid)


def _tri_pack_rows(geo: Geometry) -> jnp.ndarray:
    """(12, Tpad) triangle layout for the Pallas tiled intersector
    (ops/intersect_pallas.py) built inside jit — loop-invariant, XLA
    hoists it out of the bounce scan."""
    from mitsuba_path_guiding_tpu.ops.intersect_pallas import TRI_TILE

    t = geo.p0.shape[0]
    tpad = ((t + TRI_TILE - 1) // TRI_TILE) * TRI_TILE
    ids = jnp.arange(t, dtype=jnp.float32)
    rows = jnp.concatenate(
        [geo.p0.T, geo.e1.T, geo.e2.T, ids[None], jnp.zeros((2, t))], axis=0
    )
    pack = jnp.pad(rows, ((0, 0), (0, tpad - t)))
    if tpad > t:
        pack = pack.at[9, t:].set(-1.0)
    return pack


def intersect_pallas(geo: Geometry, o, d, tmax=None) -> Hit:
    """Closest hit via the VMEM-tiled Pallas kernel (TPU hot path)."""
    from mitsuba_path_guiding_tpu.ops.intersect_pallas import intersect_tiled

    n = o.shape[0]
    if tmax is None:
        tmax = jnp.full((n,), INF)
    pack = _tri_pack_rows(geo)
    t, prim, u, v, valid = intersect_tiled(pack, o, d, tmax)
    return Hit(t=t, prim=prim, u=u, v=v, valid=valid)


def occluded(geo: Geometry, bvh: BVH, o, d, tmax, use_bvh: bool = True) -> jnp.ndarray:
    """Shadow-ray visibility: True if any hit before tmax."""
    if use_bvh:
        h = intersect_bvh(geo, bvh, o, d, tmax, any_hit=True)
        return h.valid
    return occluded_brute(geo, o, d, tmax)


def shadow_transmittance(
    geo: Geometry,
    bvh: BVH,
    mats_packed: jnp.ndarray,
    o,
    d,
    tmax,
    use_bvh: bool = True,
    max_hits: int = 4,
) -> jnp.ndarray:
    """Transparency-aware shadow rays (the surface part of the reference's
    Scene::evalTransmittance, scene.h:290: null/mask boundaries transmit
    instead of occluding).

    Marches up to ``max_hits`` closest hits; each hit multiplies the
    carried (N,) transmittance by its material's straight-through
    fraction: NULL -> 1, MASK -> 1 - opacity, anything else -> 0.  Only
    compiled when the scene contains transparent materials."""
    from mitsuba_path_guiding_tpu.scene.types import BSDFType

    n = o.shape[0]
    tr = jnp.ones((n,))
    o_cur = o
    t_rem = tmax
    for _ in range(max_hits):
        h = (
            intersect_bvh(geo, bvh, o_cur, d, t_rem)
            if use_bvh
            else intersect_brute(geo, o_cur, d, t_rem)
        )
        prim = jnp.maximum(h.prim, 0)
        mid = geo.shade_packed[prim, 18].astype(jnp.int32)
        mtype = mats_packed[mid, 0].astype(jnp.int32)
        opacity = mats_packed[mid, 18]
        pass_frac = jnp.where(
            mtype == BSDFType.NULL,
            1.0,
            jnp.where(mtype == BSDFType.MASK, 1.0 - opacity, 0.0),
        )
        tr = jnp.where(h.valid, tr * pass_frac, tr)
        step = jnp.where(h.valid, h.t + EPS_T, 0.0)
        o_cur = o_cur + step[..., None] * d
        t_rem = t_rem - step
        if max_hits == 1:
            break
    return tr


def _unproven_idx(proven, cap):
    """First ``cap`` unproven ray indices, ascending.  jnp.nonzero's
    cumsum+scatter lowering measured ~11 ms at 262k lanes; an ascending
    single-key sort of (index | IMAX) is ~1.5 ms and equivalent: fill
    duplicates get masked by the caller's ~proven[idx] re-check."""
    n = proven.shape[0]
    key = jnp.where(proven, jnp.int32(0x7FFFFFFF),
                    jnp.arange(n, dtype=jnp.int32))
    return jnp.clip(jnp.sort(key)[:cap], 0, n - 1)


def _fallback_cap(n: int, shift: int = 4) -> int:
    # unproven rays re-traced through the blocklist kernel per wave;
    # measured unproven is 0.1% (bounce/shadow) to ~5% (coherent) of
    # rays, so n>>4 holds them all.  Bounce-wave call sites pass a
    # larger shift (cheaper nonzero+gather glue); beyond the cap
    # stragglers keep their nearest-L pair result, which can only be
    # wrong if a dropped farther candidate held the true hit.
    return min(max(4096, n >> shift), n)


def intersect_pairs_full(pairs, blocks, o, d, tmax=None, ksb=None,
                         l_blk=None, fb_shift=4, cap_factor=None,
                         engine="mt") -> Hit:
    """Closest hit through the pair-expansion pipeline
    (ops/intersect_pairs.py) with the blocklist kernel re-tracing the
    rays whose nearest-L candidate list could not be proven complete.

    ``ksb``/``l_blk`` tune the candidate-list width per call site:
    coherent camera waves are cheap to prove complete at large L (few
    fallbacks), while bounce waves average ~2.1 valid blocks/ray and
    waste sort/MT bytes above L≈5 (NEXT.md round-3 measurements)."""
    from mitsuba_path_guiding_tpu.ops.intersect_blocklist import (
        intersect_blocklist_raw,
    )
    from mitsuba_path_guiding_tpu.ops.intersect_pairs import (
        PAIR_KSB,
        PAIR_L,
        intersect_pairs_raw,
    )

    n = o.shape[0]
    if tmax is None:
        tmax = jnp.full((n,), INF)
    on_tpu = jax.default_backend() == "tpu"
    t, prim, u, v, valid, proven = intersect_pairs_raw(
        pairs, o, d, tmax, ksb=ksb or PAIR_KSB, l_blk=l_blk or PAIR_L,
        use_pallas=on_tpu, cap_factor=cap_factor, engine=engine,
    )
    cap = _fallback_cap(n, fb_shift)
    idx = _unproven_idx(proven, cap)
    fb = ~proven[idx]                      # mask duplicate fill entries
    t2, p2, u2, v2, v2ok = intersect_blocklist_raw(
        blocks, o[idx], d[idx], tmax[idx], interpret=not on_tpu
    )
    t = t.at[idx].set(jnp.where(fb, t2, t[idx]))
    prim = prim.at[idx].set(jnp.where(fb, p2, prim[idx]))
    u = u.at[idx].set(jnp.where(fb, u2, u[idx]))
    v = v.at[idx].set(jnp.where(fb, v2, v[idx]))
    valid = valid.at[idx].set(jnp.where(fb, v2ok, valid[idx]))
    return Hit(t=t, prim=prim, u=u, v=v, valid=valid)


def occluded_pairs_full(pairs, blocks, o, d, tmax, ksb=None,
                        l_blk=None, fb_shift=4, cap_factor=None,
                        engine="mt") -> jnp.ndarray:
    """Any-hit visibility through the pair pipeline + blocklist fallback."""
    from mitsuba_path_guiding_tpu.ops.intersect_blocklist import (
        occluded_blocklist_raw,
    )
    from mitsuba_path_guiding_tpu.ops.intersect_pairs import (
        PAIR_KSB,
        PAIR_L,
        intersect_pairs_raw,
    )

    n = o.shape[0]
    on_tpu = jax.default_backend() == "tpu"
    occ, proven = intersect_pairs_raw(
        pairs, o, d, tmax, ksb=ksb or PAIR_KSB, l_blk=l_blk or PAIR_L,
        any_hit=True, use_pallas=on_tpu, cap_factor=cap_factor,
        engine=engine,
    )
    cap = _fallback_cap(n, fb_shift)
    idx = _unproven_idx(proven, cap)
    fb = ~proven[idx]
    occ2 = occluded_blocklist_raw(
        blocks, o[idx], d[idx], tmax[idx], interpret=not on_tpu
    )
    return occ.at[idx].set(jnp.where(fb, occ2, occ[idx]))


def intersect_twolevel(blocks, o, d, tmax=None) -> Hit:
    """Closest hit via the candidate-list block kernel with per-wave ray
    Morton sorting (ops/intersect_blocklist.py) — the large-scene TPU
    path.  (Name kept from the round-1 superblock kernel it replaced.)"""
    from mitsuba_path_guiding_tpu.ops.intersect_blocklist import (
        intersect_blocklist_sorted,
    )

    n = o.shape[0]
    if tmax is None:
        tmax = jnp.full((n,), INF)
    t, prim, u, v, valid = intersect_blocklist_sorted(blocks, o, d, tmax)
    return Hit(t=t, prim=prim, u=u, v=v, valid=valid)


def occluded_twolevel(blocks, o, d, tmax) -> jnp.ndarray:
    """Any-hit shadow query through the block-list kernel (first hit
    terminates the ray — cheaper than closest-hit for NEE visibility)."""
    from mitsuba_path_guiding_tpu.ops.intersect_blocklist import (
        occluded_blocklist_sorted,
    )

    return occluded_blocklist_sorted(blocks, o, d, tmax)
