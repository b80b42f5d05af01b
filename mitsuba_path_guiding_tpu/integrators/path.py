"""Wavefront unidirectional path tracer with NEE + MIS + Russian roulette.

TPU-native re-design of the reference's megakernel ``Li()`` recursion
(/root/reference/src/integrators/path/path.cpp:119-290 and the fork's
progressive_path.cpp): the bounce loop is a ``lax.scan`` over a fixed-depth
SoA ray population with alive masks — breadth-first wavefront stages
{intersect, emitter-eval, NEE, BSDF-sample, RR} instead of divergent
recursion (SURVEY.md §7 design stance).

Guiding hook: ``guide`` (see guiding/) mixes a learned directional
distribution into BSDF sampling with one-sample MIS — the integration point
the fork's pre/postprogression hooks exist for.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.accel.traverse import (
    EPS_T,
    intersect_brute,
    intersect_bvh,
    intersect_pallas,
    intersect_twolevel,
    occluded,
)
from mitsuba_path_guiding_tpu.core.math import (
    Frame,
    dot,
    face_forward,
    normalize,
    power_heuristic,
)
from mitsuba_path_guiding_tpu.core.rng import bounce_uniform
from mitsuba_path_guiding_tpu.models import bsdf as bsdf_mod
from mitsuba_path_guiding_tpu.models import emitter as em_mod
from mitsuba_path_guiding_tpu.scene.types import BSDFType, SceneData

INFD = jnp.float32(3.0e37)

# Camera-peel knobs for the pair-expansion accel (tools/ab_peel.py sweeps
# them; read at trace time — jax.clear_caches() to re-apply).  MEASURED
# ON v5e (door_room 244k tris, 512x512 depth-5, best-of-3): peel OFF
# L=8 everywhere 4.61 Mrays/s; peel cam=(12,12) scan L=5 4.03; scan L=4
# 3.37.  NEXT.md's estimated 40% tile shrink from narrow in-scan lists
# does NOT materialize: pipeline cost is ~linear in N*L ONLY for the
# sorts, while the fallback re-trace grows with the unproven fraction —
# at L=5 the extra blocklist fallback traffic exceeds the sort savings.
# Peel therefore defaults OFF; the knobs stay for future scenes where
# bounce lists are shallower.
CAM_PAIR_CFG = (12, 12)
SCAN_PAIR_CFG = (8, 8)
PAIR_PEEL = False
# pair-compaction budget (ops/intersect_pairs.py cap_factor): the kernel
# grid + pair gathers process only cap*N + dummies sorted entries.
# Bounce/shadow waves average ~2.1 valid slots/ray, but the scan body
# also serves the CAMERA wave (~4.6 valid/ray): cap=5 keeps the cut in
# the IMAX tail for all of them (measured: cap=3 regressed 4.9 -> 4.3
# Mrays/s by cutting real camera pairs into the fallback).  None = full.
PAIR_CAP = 5
# intersection engine for the pair pipeline: "mt" (dense VPU tiles) or
# "plk" (MXU Pluecker matmul tiles) — see ops/intersect_pairs.py
PAIR_ENGINE = "mt"
# fallback-cap shifts: cap = max(4096, n >> shift).  Camera waves are
# ~5% unproven (needs n>>4); bounce/shadow waves are ~0.1% unproven so
# their nonzero+gather+blocklist fallback glue can run at a fraction of
# the capacity.
CAM_FB_SHIFT = 4
SCAN_FB_SHIFT = 4
# any-hit shadow routing A/B: on the synthetic interior (247k tris) the
# union-tile blocklist any-hit beat the pair pipeline 49 vs 77 ms at
# 262k rays, but on door_room the full bench REGRESSED 4.87 -> 4.56
# Mrays/s (the blocklist's per-tile union lists blow up on door_room's
# deeper bounce distributions).  Pairs stay the default.
SHADOW_BLOCKLIST = False


class PathAux(NamedTuple):
    """First-hit feature buffers (denoiser/guiding AOVs — fork's
    Denoiser albedo/normal inputs, denoiser.cpp:38-58)."""

    albedo: jnp.ndarray  # (N, 3)
    normal: jnp.ndarray  # (N, 3)
    depth_t: jnp.ndarray # (N,)
    n_bounces: jnp.ndarray  # (N,) realized path length (avgPathLength stat)
    first_le: jnp.ndarray  # (N, 3) emission seen at the first hit (lets
    #                        callers split L into direct-at-first-hit vs
    #                        rest — the irrcache gradient stencil needs it)


class PathRecord(NamedTuple):
    """Per-bounce records for guiding-cache training (the sample storage of
    SURVEY.md §7 step 6: position/direction/radiance with provenance).

    ``li`` is the luminance of radiance that arrived at the vertex through
    the sampled direction (Monte Carlo estimate); ``pdf`` the solid-angle
    density the direction was drawn with — fitting weights are li/pdf so
    the fitted mixture approximates incident radiance (Practical Path
    Guiding / OpenPGL convention).

    Layout: component-major (D, 3, N) for vectors — a (D, N, 3) layout
    would lane-pad the trailing 3 to 128 on TPU (~40x memory)."""

    pos: jnp.ndarray       # (D, 3, N) shading points
    dir: jnp.ndarray       # (D, 3, N) sampled outgoing dirs (world)
    li: jnp.ndarray        # (D, N) luminance arriving through dir
    pdf: jnp.ndarray       # (D, N) sampling pdf of dir
    valid: jnp.ndarray     # (D, N) bool
    # distance to the vertex the sampled dir actually hit (INFD on escape)
    # — the parallax-aware mixtures' per-lobe distance statistic input
    # (Ruppert et al. 2020; reference fork host, SURVEY §0)
    dist: jnp.ndarray = None  # (D, N)


def _offset_ray(p, ng, d):
    """Offset origin along the geometric normal toward the ray side."""
    s = jnp.sign(dot(ng, d))[..., None]
    return p + ng * s * 1e-4


@partial(
    jax.jit,
    static_argnames=(
        "max_depth",
        "rr_depth",
        "use_nee",
        "use_bvh",
        "record_paths",
        "guide",
        "em_kinds",
        "mat_types",
        "textured",
        "bumped",
        "clothed",
        "accel",
        "cone_angle",
    ),
)
def trace(
    scene: SceneData,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    rkeys,
    max_depth: int = 5,
    rr_depth: int = 5,
    use_nee: bool = True,
    use_bvh: bool = True,
    guide=None,
    guide_state=None,
    record_paths: bool = False,
    em_kinds=em_mod.ALL_KINDS,
    mat_types=bsdf_mod.ALL_TYPES,
    textured: bool = False,
    bumped: bool = False,
    clothed: bool = False,  # scene has CLOTH rows: fetch yarn records
    uniforms=None,
    accel: str = "auto",  # "auto" (use_bvh flag) | "brute" | "bvh" | "pallas"
    cone_angle: float = 0.0,  # per-ray footprint half-angle; > 0 enables
    #                           ray-cone trilinear mip filtering (mipmap.h)
):
    """Trace one wavefront to completion.

    Returns (L (N,3), PathAux, PathRecord|None).  ``use_nee`` mirrors the
    fork's progressive_volpath ``useNee`` toggle
    (progressive_volpath.cpp:82) — guided-sampling quality isolation.

    ``uniforms``: optional (9*max_depth, N) explicit primary-sample-space
    coordinates (dim-major to avoid TPU lane padding) replacing the
    counter-based RNG — the hook PSSMLT's lazy PSS mutations drive
    (reference pssmlt_sampler.h:34-112).
    """
    n = ray_o.shape[0]
    geo, bvh, mats, em = scene.geo, scene.bvh, scene.mats, scene.emitters

    # big scenes on TPU route to the two-level superblock kernel (their
    # BlockTable is built by the scene compiler above TWOLEVEL_MIN_TRIS);
    # the vmapped BVH serves CPU, the dense kernels serve small scenes
    twolevel = accel == "twolevel" or (
        accel == "auto"
        and scene.blocks is not None
        and jax.default_backend() == "tpu"
    )

    def intersect(o, d, tmax=None, pair_cfg=None):
        if twolevel:
            if scene.pairs is not None:
                from mitsuba_path_guiding_tpu.accel.traverse import (
                    intersect_pairs_full,
                )

                ksb, l_blk, fb = pair_cfg if pair_cfg else (None, None, 4)
                return intersect_pairs_full(
                    scene.pairs, scene.blocks, o, d, tmax, ksb=ksb,
                    l_blk=l_blk, fb_shift=fb, cap_factor=PAIR_CAP,
                    engine=PAIR_ENGINE,
                )
            return intersect_twolevel(scene.blocks, o, d, tmax)
        if accel == "pallas":
            return intersect_pallas(geo, o, d, tmax)
        if use_bvh or accel == "bvh":
            return intersect_bvh(geo, bvh, o, d, tmax)
        return intersect_brute(geo, o, d, tmax)

    # transparent (null/mask) surfaces transmit shadow rays — the surface
    # part of Scene::evalTransmittance (scene.h:290); boolean occlusion
    # compiles when the scene has no transparent materials
    transparent_shadows = (BSDFType.NULL in mat_types) or (BSDFType.MASK in mat_types)

    def shadow_visibility(o, d, tmax):
        if transparent_shadows:
            from mitsuba_path_guiding_tpu.accel.traverse import shadow_transmittance

            return shadow_transmittance(
                geo, bvh, mats.packed, o, d, tmax, use_bvh=use_bvh
            )
        if twolevel:
            if scene.pairs is not None and not SHADOW_BLOCKLIST:
                from mitsuba_path_guiding_tpu.accel.traverse import (
                    occluded_pairs_full,
                )

                return 1.0 - occluded_pairs_full(
                    scene.pairs, scene.blocks, o, d, tmax,
                    ksb=SCAN_PAIR_CFG[0], l_blk=SCAN_PAIR_CFG[1],
                    fb_shift=SCAN_FB_SHIFT, cap_factor=PAIR_CAP,
                    engine=PAIR_ENGINE,
                ).astype(jnp.float32)
            from mitsuba_path_guiding_tpu.accel.traverse import occluded_twolevel

            return 1.0 - occluded_twolevel(scene.blocks, o, d, tmax).astype(jnp.float32)
        if accel == "pallas":
            h = intersect(o, d, tmax)
            return 1.0 - h.valid.astype(jnp.float32)
        return 1.0 - occluded(geo, bvh, o, d, tmax, use_bvh=use_bvh)

    L0 = jnp.zeros((n, 3))
    T0 = jnp.ones((n, 3))
    alive0 = jnp.ones((n,), dtype=bool)
    prev_pdf0 = jnp.full((n,), INFD)  # camera vertex: treat as delta
    prev_delta0 = jnp.ones((n,), dtype=bool)
    aux0 = PathAux(
        albedo=jnp.zeros((n, 3)),
        normal=jnp.zeros((n, 3)),
        depth_t=jnp.zeros((n,)),
        n_bounces=jnp.zeros((n,), jnp.int32),
        first_le=jnp.zeros((n, 3)),
    )

    # uniform layout per bounce: 0:3 NEE, 3:6 BSDF (2 dir + lobe),
    # 6 guide-selection, 7 guide-lobe, 8 russian roulette
    def bounce(carry, depth, peel=False):
        o, d, L, T, alive, prev_pdf, prev_delta, t_acc, aux = carry
        if uniforms is None:
            u = bounce_uniform(rkeys, depth, 9)
        else:
            u = jnp.moveaxis(
                jax.lax.dynamic_slice_in_dim(uniforms, depth * 9, 9, axis=0), 0, -1
            )

        # dead lanes must not pay for candidate lists / traversal in the
        # accel kernels: tmax < 0 fails every slab test, so their lists
        # are empty (inert tiles) and the completeness proof is trivial
        hit = intersect(
            o, d, jnp.where(alive, INFD, -1.0),
            pair_cfg=(CAM_PAIR_CFG + (CAM_FB_SHIFT,) if peel
                      else SCAN_PAIR_CFG + (SCAN_FB_SHIFT,)),
        )
        escaped = alive & ~hit.valid

        # --- environment on escape, MIS vs NEE (path.cpp:141,226-244);
        # with NEE off the BSDF strategy is the only one -> weight 1
        env_L = em_mod.eval_env(em, d, kinds=em_kinds)
        if use_nee:
            pdf_nee_env = em_mod.pdf_env(em, d, kinds=em_kinds)
            w_env = jnp.where(
                prev_delta,
                1.0,
                power_heuristic(prev_pdf, jnp.broadcast_to(pdf_nee_env, prev_pdf.shape)),
            )
        else:
            w_env = jnp.ones_like(prev_pdf)
        L = jnp.where(escaped[..., None], L + T * env_L * w_env[..., None], L)

        act = alive & hit.valid
        prim = jnp.maximum(hit.prim, 0)
        # sanitized hit distance: t = INF on miss lanes would produce
        # p = inf and NaN-poison reverse-mode AD through the masked maths
        t_hit = jnp.where(hit.valid, hit.t, 1.0)
        p = o + t_hit[..., None] * d
        # ONE packed row gather for all per-hit data (see Geometry layout)
        from mitsuba_path_guiding_tpu.ops.gather_pallas import gather_rows_t

        row = gather_rows_t(geo.shade_packed, prim)  # (32, N)
        ng = jnp.stack([row[0], row[1], row[2]], axis=-1)
        b0 = 1.0 - hit.u - hit.v
        ns = normalize(
            jnp.stack(
                [
                    b0 * row[3] + hit.u * row[6] + hit.v * row[9],
                    b0 * row[4] + hit.u * row[7] + hit.v * row[10],
                    b0 * row[5] + hit.u * row[8] + hit.v * row[11],
                ],
                axis=-1,
            )
        )
        # keep shading normal on the same side as the geometric one w.r.t. ray
        ns = jnp.where(dot(ns, ng)[..., None] < 0.0, -ns, ns)
        mid = row[18].astype(jnp.int32)
        is_emitter = row[19] >= 0.0
        if textured or bumped or clothed:
            from mitsuba_path_guiding_tpu.models.texture import sample_atlas

            # one packed material-row gather serves the texture machinery
            # (UV tiling factors, wireframe params); CSEs with the BSDF's
            mrow = gather_rows_t(mats.packed, mid)  # (32, N)
            uv_hit = jnp.stack(
                [
                    (b0 * row[12] + hit.u * row[14] + hit.v * row[16]) * mrow[25],
                    (b0 * row[13] + hit.u * row[15] + hit.v * row[17]) * mrow[26],
                ],
                axis=-1,
            )
        def _lod(tid_):
            if cone_angle <= 0.0:
                return None
            # ray-cone footprint: distance x cone x (UV per world unit) x
            # texels per UV; diffuse/glossy scatters widen the cone
            cone_eff = jnp.where(prev_delta, cone_angle, 0.15)
            res = jnp.maximum(
                scene.texture_sizes[jnp.maximum(tid_, 0), 0],
                scene.texture_sizes[jnp.maximum(tid_, 0), 1],
            )
            fp = (t_acc + t_hit) * cone_eff * row[26] * res
            return jnp.log2(jnp.maximum(fp, 1.0))

        if textured:
            # reflectance override from the atlas (textures/bitmap.cpp),
            # trilinear mip filtered when the caller supplies a cone angle
            tid = scene.mats.texture_id[mid]
            val = sample_atlas(scene.textures, scene.texture_sizes, tid, uv_hit,
                               lod=_lod(tid))
            if geo.vcol is not None:
                # interpolated vertex colors (vertexcolors.cpp; curvature
                # maps are baked to vertex colors at build time)
                vrow = gather_rows_t(geo.vcol, prim)  # (9, N)
                vc = jnp.stack(
                    [
                        b0 * vrow[0] + hit.u * vrow[3] + hit.v * vrow[6],
                        b0 * vrow[1] + hit.u * vrow[4] + hit.v * vrow[7],
                        b0 * vrow[2] + hit.u * vrow[5] + hit.v * vrow[8],
                    ],
                    axis=-1,
                )
                val = jnp.where((tid == -3)[..., None], vc, val)
            # wireframe (wireframe.cpp): barycentric edge distance < width
            # selects the edge color; the material row carries both colors
            lw = mrow[24]
            edge = jnp.minimum(jnp.minimum(b0, hit.u), hit.v) < lw
            wire_val = jnp.where(
                edge[..., None],
                jnp.stack([mrow[21], mrow[22], mrow[23]], axis=-1),
                jnp.stack([mrow[1], mrow[2], mrow[3]], axis=-1),
            )
            val = jnp.where((tid == -4)[..., None], wire_val, val)
            tex = (val, (tid >= 0) | (tid <= -3))
        else:
            tex = None
        if clothed:
            # CLOTH rows carry a yarn-record map in the bump slot
            # (models/cloth.py encoding): one nearest fetch replaces the
            # reference's per-query weave-cell walk (irawan.cpp:192-270);
            # the record feeds the band-gated integrand in models/bsdf.py
            from mitsuba_path_guiding_tpu.models.cloth import decode_record
            from mitsuba_path_guiding_tpu.models.texture import (
                sample_atlas_nearest,
            )

            is_cloth = mrow[0] == float(int(BSDFType.CLOTH))
            rec = sample_atlas_nearest(
                scene.textures, scene.texture_sizes,
                jnp.maximum(mats.packed[mid, 19].astype(jnp.int32), 0),
                uv_hit,
            )
            cloth_aux = decode_record(rec)
        else:
            cloth_aux = None
        if bumped:
            # normal-map frame perturbation (reference bsdfs/normalmap.cpp;
            # bumpmap.cpp heights become normal maps at build time);
            # CLOTH rows are excluded — their bump slot is a data texture
            # and the Irawan model shades in the base frame (the oracle
            # has no normal perturbation)
            btid = mats.packed[mid, 19].astype(jnp.int32)
            n_t = sample_atlas(scene.textures, scene.texture_sizes, jnp.maximum(btid, 0), uv_hit) * 2.0 - 1.0
            ns_b = normalize(Frame.from_normal(ns).to_world(normalize(n_t)))
            # stay on the geometric side (same guard as the base normal)
            ns_b = jnp.where(dot(ns_b, ng)[..., None] < 0.0, -ns_b, ns_b)
            apply_b = btid >= 0
            if clothed:
                apply_b = apply_b & ~is_cloth
            ns = jnp.where(apply_b[..., None], ns_b, ns)

        # --- emissive hit with MIS against NEE (path.cpp:163-174,209-258);
        # emitted radiance / pmf / area are baked into the packed row
        cos_l = dot(ng, -d)
        Le = jnp.where(
            (is_emitter & (cos_l > 0.0))[..., None],
            jnp.stack([row[20], row[21], row[22]], axis=-1),
            0.0,
        )
        if use_nee:
            # distance accumulated through straight pass-throughs (null/
            # mask) keeps NEE-vs-BSDF MIS consistent across them — the
            # reference's index-matched handling (volpath.cpp:376-429)
            d_mis = t_hit + t_acc
            dist2 = d_mis * d_mis
            pdf_nee_hit = row[23] * dist2 / jnp.maximum(
                jnp.abs(cos_l) * jnp.maximum(row[25], 1e-12), 1e-12
            )
            pdf_nee_hit = jnp.where(is_emitter, pdf_nee_hit, 0.0)
            w_hit = jnp.where(prev_delta, 1.0, power_heuristic(prev_pdf, pdf_nee_hit))
        else:
            w_hit = jnp.ones_like(prev_pdf)
        L = jnp.where(act[..., None], L + T * Le * w_hit[..., None], L)

        frame = Frame.from_normal(ns)
        wi_local = frame.to_local(-d)

        # --- aux AOVs at first hit
        first = act & (aux.depth_t == 0.0)
        aux = PathAux(
            albedo=jnp.where(first[..., None], bsdf_mod.albedo(mats, mid), aux.albedo),
            normal=jnp.where(first[..., None], ns, aux.normal),
            depth_t=jnp.where(first, hit.t, aux.depth_t),
            n_bounces=aux.n_bounces + act.astype(jnp.int32),
            first_le=jnp.where(first[..., None], Le, aux.first_le),
        )

        # --- next-event estimation (path.cpp:176-207)
        if use_nee:
            ds = em_mod.sample_direct_jit(em, geo, p, u[..., 0:3], kinds=em_kinds)
            wo_local_nee = frame.to_local(ds.direction)
            f_nee, pdf_bsdf_nee = bsdf_mod.eval_pdf(
                mats, mid, wi_local, wo_local_nee, types=mat_types, tex=tex,
                cloth_aux=cloth_aux)
            # MIS against the ACTUAL direction strategy: with guiding on,
            # the density at the light direction is the combined
            # alpha*p_guide + (1-alpha)*p_bsdf — weighting with the plain
            # BSDF pdf while the emission-hit side uses the combined pdf
            # makes the two MIS weights sum past 1 (upward bias wherever
            # the cache concentrates on the light; round-4 fix)
            if guide is not None:
                pdf_dir_nee = guide.pdf_at(
                    guide_state, mats, mid, p, frame, ds.direction,
                    pdf_bsdf_nee)
            else:
                pdf_dir_nee = pdf_bsdf_nee
            o_sh = _offset_ray(p, ng, ds.direction)
            t_sh = jnp.where(ds.distance >= INFD, INFD, ds.distance * (1.0 - 1e-3))
            vis = shadow_visibility(
                o_sh, ds.direction, jnp.where(act, t_sh, -1.0)
            )
            w_mis = jnp.where(ds.is_delta, 1.0, power_heuristic(ds.pdf, pdf_dir_nee))
            contrib = (
                T * f_nee * ds.radiance
                * (vis * w_mis / jnp.maximum(ds.pdf, 1e-12))[..., None]
            )
            good = act & (vis > 0.0) & (ds.pdf > 0.0)
            L = jnp.where(good[..., None], L + contrib, L)

        # --- BSDF (or guided) sampling
        if guide is None:
            bs = bsdf_mod.sample(mats, mid, wi_local, u[..., 3:6],
                                 types=mat_types, tex=tex,
                                 cloth_aux=cloth_aux)
            wo_world = frame.to_world(bs.wo)
            next_pdf = bs.pdf
            next_weight = bs.weight
            next_delta = bs.is_delta
        else:
            wo_world, next_pdf, next_weight, next_delta = guide(
                guide_state,
                mats,
                mid,
                p,
                frame,
                wi_local,
                u[..., 3:6],
                u[..., 6],
                u[..., 7],
                tex,
                cloth_aux,
            )

        T_new = T * next_weight
        cont = act & (jnp.max(jnp.abs(T_new), axis=-1) > 0.0) & (next_pdf > 0.0)

        # --- russian roulette (path.cpp:277-286)
        rr_active = depth >= rr_depth
        q = jnp.clip(jnp.max(T_new, axis=-1), 0.05, 0.95)
        rr_pass = u[..., 8] < q
        T_new = jnp.where(
            (rr_active & cont)[..., None], T_new / jnp.maximum(q, 1e-6)[..., None], T_new
        )
        cont = cont & jnp.where(rr_active, rr_pass, True)

        # straight pass-throughs (null/mask transmission) keep the MIS
        # state of the last REAL vertex: the direction pdf is unchanged,
        # only distance accumulates (otherwise light hits behind the
        # transparent surface get delta weight 1 AND full NEE = double
        # counting)
        if transparent_shadows:
            straight = next_delta & (dot(wo_world, d) > 1.0 - 1e-6)
            next_pdf_c = jnp.where(straight, prev_pdf, next_pdf)
            next_delta_c = jnp.where(straight, prev_delta, next_delta)
            t_acc_new = jnp.where(straight, t_acc + t_hit, 0.0)
        else:
            next_pdf_c, next_delta_c = next_pdf, next_delta
            t_acc_new = jnp.zeros_like(t_acc)

        o_next = _offset_ray(p, ng, wo_world)
        new_carry = (
            jnp.where(cont[..., None], o_next, o),
            jnp.where(cont[..., None], wo_world, d),
            L,
            jnp.where(cont[..., None], T_new, T),
            cont,
            jnp.where(cont, next_pdf_c, prev_pdf),
            jnp.where(cont, next_delta_c, prev_delta),
            jnp.where(cont, t_acc_new, t_acc),
            aux,
        )
        if record_paths:
            from mitsuba_path_guiding_tpu.core.spectrum import luminance

            # Li through the sampled dir = (radiance found after this
            # bounce) / throughput-after — both recorded here, combined
            # after the scan.  Delta-sampled dirs excluded (not guidable).
            # Vectors emitted component-major (3, N) — see PathRecord.
            rec = (
                jnp.stack([p[..., 0], p[..., 1], p[..., 2]], axis=0),
                jnp.stack([wo_world[..., 0], wo_world[..., 1], wo_world[..., 2]], axis=0),
                luminance(L),
                luminance(jnp.where(cont[..., None], T_new, T)),
                next_pdf,
                act & ~next_delta,
                jnp.where(hit.valid, t_hit, INFD),  # this bounce's segment
            )
        else:
            rec = None
        return new_carry, rec

    carry0 = (
        ray_o, ray_d, L0, T0, alive0, prev_pdf0, prev_delta0,
        jnp.zeros((n,)), aux0,
    )
    # Camera peel (pairs accel only): depth 0 is the one coherent wave —
    # run it outside the scan with the wide camera pair lists; bounces
    # 1..D-1 scan one body compiled with the narrow in-scan lists.
    peel_camera = (
        PAIR_PEEL and twolevel and scene.pairs is not None and max_depth > 1
    )
    if peel_camera:
        carry1, rec0 = bounce(carry0, jnp.int32(0), peel=True)
        carry, recs = jax.lax.scan(bounce, carry1, jnp.arange(1, max_depth))
        if record_paths:
            recs = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a[None], b], axis=0), rec0, recs
            )
    else:
        carry, recs = jax.lax.scan(bounce, carry0, jnp.arange(max_depth))
    _, _, L, _, _, _, _, _, aux = carry

    record = None
    if record_paths:
        from mitsuba_path_guiding_tpu.core.spectrum import luminance

        rec_pos, rec_dir, rec_lumL, rec_lumT, rec_pdf, rec_valid, rec_t = recs
        lum_final = luminance(L)[None, :]  # (1, N)
        li = jnp.maximum(lum_final - rec_lumL, 0.0) / jnp.maximum(rec_lumT, 1e-6)
        # distance of record d = the NEXT bounce's segment length (the
        # sampled dir's hit); the last bounce's continuation is unknown
        rec_dist = jnp.concatenate(
            [rec_t[1:], jnp.full_like(rec_t[:1], INFD)], axis=0
        )
        record = PathRecord(
            pos=rec_pos, dir=rec_dir, li=li, pdf=rec_pdf, valid=rec_valid,
            dist=rec_dist,
        )
    return L, aux, record
