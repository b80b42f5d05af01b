"""Emitter sampling: NEE direct sampling, hit evaluation, and MIS pdfs.

Wavefront counterpart of the reference's Scene::sampleEmitterDirect /
pdfEmitterDirect (/root/reference/include/mitsuba/render/scene.h:482-756)
and the emitter plugins (src/emitters/{area,point,constant,directional,
spot}.cpp).  Sampling draws an emitter record from the power-weighted
discrete PMF (searchsorted over the CDF), then a position/direction on it —
all in one batched pass, selected by emitter kind.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.math import Frame, dot, normalize
from mitsuba_path_guiding_tpu.core.warp import (
    INV_FOURPI,
    square_to_cosine_hemisphere,
    square_to_uniform_disk_concentric,
    square_to_uniform_sphere,
    square_to_uniform_triangle,
)
from mitsuba_path_guiding_tpu.scene.types import Emitters, EmitterKind, Geometry

DELTA_EPS = 1e-7


class DirectSample(NamedTuple):
    """One NEE sample toward an emitter, from shading point ``p``."""

    direction: jnp.ndarray  # (N, 3) unit, from p toward the emitter
    distance: jnp.ndarray   # (N,) distance to the emitter point (INF for env/directional)
    radiance: jnp.ndarray   # (N, 3) emitted radiance toward p (already /dist^2 for point)
    pdf: jnp.ndarray        # (N,) solid-angle pdf (includes emitter-pick pmf);
                            # for delta emitters: discrete prob (MIS treats as delta)
    is_delta: jnp.ndarray   # (N,) bool — point/directional/spot can't be MIS'd
    emitter_id: jnp.ndarray # (N,) int32
    # bidirectional-MIS extras (VCM-style; zero for kinds BDPT doesn't cover):
    cos_light: jnp.ndarray = None       # (N,) |cos| at the emitter toward p (1 for point-like)
    emission_pdf_w: jnp.ndarray = None  # (N,) pdf of EMITTING this (point, dir):
                                        # pick * pdf_pos_A * pdf_dir_W


from functools import partial as _partial

import jax as _jax

ALL_KINDS = (
    EmitterKind.AREA,
    EmitterKind.POINT,
    EmitterKind.CONSTANT,
    EmitterKind.DIRECTIONAL,
    EmitterKind.SPOT,
    EmitterKind.COLLIMATED,
)


def kinds_present(em: Emitters):
    """Static tuple of emitter kinds in a (host-concrete) scene — pass to
    sample_direct/trace so jit specializes away absent branches."""
    import numpy as np

    return tuple(sorted(set(np.asarray(em.kind).tolist())))


def _pick_emitter(em: Emitters, u0: jnp.ndarray) -> jnp.ndarray:
    """CDF inversion for the emitter pick.  jnp.searchsorted lowers to a
    serial binary-search while-loop on TPU (the profiler's ~1 ms/bounce
    fusion.225/select_reduce chain, NEXT.md guided-headline item); for
    the emitter counts real scenes have, a dense (E, N) compare + sum is
    one fully-parallel VPU pass.  Equivalent to
    searchsorted(cdf, u0, side="right") clipped to the table.

    Threshold (ADVICE r3): the dense path builds an (E, N) boolean
    intermediate — at a 1M-lane wavefront that is ~128 MB of compares at
    E=128 and relies on XLA fusing it away; 128 keeps the worst case
    bounded near the few-emitter regime this path is for, while larger
    emitter tables fall back to searchsorted."""
    e = em.cdf.shape[0]
    if e <= 128:
        eid = jnp.sum(
            (em.cdf[:, None] <= u0[None, :]).astype(jnp.int32), axis=0
        )
    else:
        eid = jnp.searchsorted(em.cdf, u0, side="right")
    return jnp.clip(eid, 0, em.kind.shape[0] - 1).astype(jnp.int32)


def sample_direct(
    em: Emitters, geo: Geometry, p: jnp.ndarray, u: jnp.ndarray, kinds=ALL_KINDS
) -> DirectSample:
    """Draw one emitter sample per lane.  ``u``: (N,3) uniforms
    (u[...,0] picks the emitter, u[...,1:3] the position).  ``kinds`` is a
    static tuple of EmitterKind values present in the scene: only those
    branches are compiled (the common area+env scene skips 3/5 of this)."""
    n = p.shape[0]
    eid = _pick_emitter(em, u[..., 0])
    # single packed row gather (Emitters.packed layout) — separate field
    # gathers materialize lane-padded (N,3) arrays on TPU
    from mitsuba_path_guiding_tpu.ops.gather_pallas import gather_rows_t

    row = gather_rows_t(em.packed, eid)  # (32, N)
    kind = row[0].astype(jnp.int32)
    pmf = row[1]
    rad = jnp.stack([row[2], row[3], row[4]], axis=-1)
    u2 = u[..., 1:3]
    INFD = jnp.float32(3.0e37)

    direction = jnp.zeros((n, 3))
    distance = jnp.full((n,), INFD)
    radiance = jnp.zeros((n, 3))
    pdf = pmf
    is_delta = jnp.zeros((n,), dtype=bool)
    cos_light = jnp.zeros((n,))
    emission_pdf_w = jnp.zeros((n,))

    def put(sel, d_, dist_, rad_, pdf_, delta_):
        nonlocal direction, distance, radiance, pdf, is_delta
        direction = jnp.where(sel[..., None], d_, direction)
        distance = jnp.where(sel, dist_, distance)
        radiance = jnp.where(sel[..., None], rad_, radiance)
        pdf = jnp.where(sel, pdf_, pdf)
        is_delta = jnp.where(sel, delta_, is_delta)

    false = jnp.zeros((n,), dtype=bool)
    true = jnp.ones((n,), dtype=bool)

    if EmitterKind.AREA in kinds:
        # uniform point on the emissive triangle (geometry baked into the
        # packed row: p0 14:17, e1 17:20, e2 20:23, unit normal 23:26)
        b = square_to_uniform_triangle(u2)
        q = jnp.stack(
            [
                row[14] + b[..., 0] * row[17] + b[..., 1] * row[20],
                row[15] + b[..., 0] * row[18] + b[..., 1] * row[21],
                row[16] + b[..., 0] * row[19] + b[..., 1] * row[22],
            ],
            axis=-1,
        )
        ng = jnp.stack([row[23], row[24], row[25]], axis=-1)
        to_q = q - p
        dist2 = jnp.maximum(dot(to_q, to_q), 1e-12)
        dist = jnp.sqrt(dist2)
        dir_a = to_q / dist[..., None]
        cos_l = dot(ng, -dir_a)
        area = jnp.maximum(row[13], 1e-12)
        pdf_a = pmf * dist2 / jnp.maximum(jnp.abs(cos_l) * area, 1e-12)
        rad_a = jnp.where((cos_l > 0.0)[..., None], rad, 0.0)
        sel_area = kind == EmitterKind.AREA
        put(sel_area, dir_a, dist, rad_a, pdf_a, false)
        cos_light = jnp.where(sel_area, jnp.maximum(cos_l, 0.0), cos_light)
        emission_pdf_w = jnp.where(
            sel_area, pmf / area * jnp.maximum(cos_l, 0.0) / jnp.pi, emission_pdf_w
        )

    if EmitterKind.POINT in kinds or EmitterKind.SPOT in kinds:
        pos = jnp.stack([row[5], row[6], row[7]], axis=-1)
        to_l = pos - p
        d2p = jnp.maximum(dot(to_l, to_l), 1e-12)
        distp = jnp.sqrt(d2p)
        dir_p = to_l / distp[..., None]
        if EmitterKind.POINT in kinds:
            sel_pt = kind == EmitterKind.POINT
            put(sel_pt, dir_p, distp, rad / d2p[..., None], pmf, true)
            cos_light = jnp.where(sel_pt, 1.0, cos_light)
            emission_pdf_w = jnp.where(sel_pt, pmf * INV_FOURPI, emission_pdf_w)
        if EmitterKind.SPOT in kinds:
            axis = jnp.stack([row[8], row[9], row[10]], axis=-1)
            cos_total = row[11]
            cos_beam = row[12]
            cd = dot(axis, -dir_p)
            falloff = jnp.clip(
                (cd - cos_total) / jnp.maximum(cos_beam - cos_total, 1e-6), 0.0, 1.0
            )
            rad_s = rad / d2p[..., None] * jnp.where(cd > cos_total, falloff, 0.0)[..., None]
            sel_sp = kind == EmitterKind.SPOT
            put(sel_sp, dir_p, distp, rad_s, pmf, true)
            cos_light = jnp.where(sel_sp, 1.0, cos_light)
            emission_pdf_w = jnp.where(
                sel_sp,
                pmf / (2.0 * jnp.pi * jnp.maximum(1.0 - cos_total, 1e-6)),
                emission_pdf_w,
            )

    if EmitterKind.CONSTANT in kinds:
        dir_e = square_to_uniform_sphere(u2)
        put(kind == EmitterKind.CONSTANT, dir_e, jnp.full((n,), INFD), rad, pmf * INV_FOURPI, false)

    if EmitterKind.DIRECTIONAL in kinds:
        dir_dl = -jnp.stack([row[5], row[6], row[7]], axis=-1)
        put(kind == EmitterKind.DIRECTIONAL, dir_dl, jnp.full((n,), INFD), rad, pmf, true)

    if EmitterKind.ENVMAP in kinds:
        from mitsuba_path_guiding_tpu.models.envmap import env_sample

        d_env, pdf_tex, rad_env = env_sample(em, u2)
        put(
            kind == EmitterKind.ENVMAP,
            d_env,
            jnp.full((n,), INFD),
            rad_env,
            pmf * pdf_tex,
            false,
        )

    return DirectSample(
        direction=direction,
        distance=distance,
        radiance=radiance,
        pdf=jnp.maximum(pdf, 1e-12),
        is_delta=is_delta,
        emitter_id=eid,
        cos_light=cos_light,
        emission_pdf_w=emission_pdf_w,
    )


def eval_hit(em: Emitters, geo: Geometry, eid, wo_world, prim):
    """Radiance emitted toward the viewer when a BSDF ray hits an emissive
    triangle (reference area.cpp eval: one-sided, cos > 0 side)."""
    ng = normalize(jnp.cross(geo.e1[prim], geo.e2[prim]))
    front = dot(ng, -wo_world) > 0.0
    return jnp.where(
        (eid >= 0)[..., None] & front[..., None], em.radiance[jnp.maximum(eid, 0)], 0.0
    )


def pdf_direct_hit(em: Emitters, geo: Geometry, eid, p, q, wo_world):
    """Solid-angle NEE pdf of having sampled the point ``q`` on emissive
    triangle hit by a BSDF ray from ``p`` — the MIS companion
    (reference Scene::pdfEmitterDirect, scene.h:745)."""
    e = jnp.maximum(eid, 0)
    tri = jnp.maximum(em.tri[e], 0)
    ng = normalize(jnp.cross(geo.e1[tri], geo.e2[tri]))
    to_q = q - p
    dist2 = jnp.maximum(dot(to_q, to_q), 1e-12)
    cos_l = jnp.abs(dot(ng, -wo_world))
    pdf = em.pmf[e] * dist2 / jnp.maximum(cos_l * jnp.maximum(em.area[e], 1e-12), 1e-12)
    return jnp.where(eid >= 0, pdf, 0.0)


def pdf_env(em: Emitters, d=None, kinds=None):
    """Solid-angle NEE pdf of sampling the environment toward ``d``.

    Constant env: uniform scalar (env_pdf = pick_pmf / 4pi).  Textured env
    (ENVMAP in ``kinds``): pick_pmf (stored in env_pdf) x per-texel pdf."""
    if kinds is not None and EmitterKind.ENVMAP in kinds:
        from mitsuba_path_guiding_tpu.models.envmap import env_pdf_dir

        return em.env_pdf * env_pdf_dir(em, d)
    return em.env_pdf


def eval_env(em: Emitters, wo_world, kinds=None):
    """Environment radiance for escaped rays."""
    if kinds is not None and EmitterKind.ENVMAP in kinds:
        from mitsuba_path_guiding_tpu.models.envmap import env_eval

        return env_eval(em, wo_world)
    return jnp.broadcast_to(em.env_radiance, wo_world.shape)


# jitted variant for use inside already-jitted integrators: the explicit
# call boundary steers XLA toward a better fusion/layout decision here
# (empirically ~2x on the NEE stage)
sample_direct_jit = _partial(_jax.jit, static_argnames=("kinds",))(sample_direct)


class RaySample(NamedTuple):
    """Emitter-ray sample for adjoint transport (reference
    Scene::sampleEmitterRay, scene.h:784-889 — the base of ParticleTracer,
    particleproc.h:128)."""

    o: jnp.ndarray       # (N, 3) ray origin
    d: jnp.ndarray       # (N, 3) ray direction (away from the emitter)
    weight: jnp.ndarray  # (N, 3) Le/(pdf_pos pdf_dir pmf) — particle power
    normal: jnp.ndarray  # (N, 3) emitter normal at o (0 for point-like)
    valid: jnp.ndarray   # (N,)
    emit_weight: jnp.ndarray  # (N, 3) Le/(pdf_pos pmf) for direct
    # emitter->sensor connections (area emitters; 0 for point/infinite)
    # bidirectional-MIS extras (VCM-style; zero where BDPT does not apply):
    emission_pdf_w: jnp.ndarray = None  # pick * pdf_pos_A * pdf_dir_W
    direct_pdf_a: jnp.ndarray = None    # pick * pdf_pos_A (NEE pdf of the
    #                                     point; SOLID-ANGLE pdf for
    #                                     infinite emitters, SmallVCM-style)
    cos_light: jnp.ndarray = None       # |cos| between emitter normal and d
    infinite: jnp.ndarray = None        # (N,) bool — env/constant/directional
    #                                     (virtual bounding-disk origin)


def sample_ray(
    em: Emitters,
    aabb_min,
    aabb_max,
    u: jnp.ndarray,
    kinds=ALL_KINDS,
) -> RaySample:
    """Sample (position, direction) on the scene's emitters for particle
    tracing.  ``u``: (N, 5) uniforms (0 emitter pick, 1:3 position,
    3:5 direction).  Infinite emitters (constant/envmap/directional) emit
    from a disk covering the scene's bounding sphere (the reference does
    the same, e.g. src/emitters/constant.cpp sampleRay)."""
    n = u.shape[0]
    eid = _pick_emitter(em, u[..., 0])
    row = em.packed[eid].T
    kind = row[0].astype(jnp.int32)
    pmf = jnp.maximum(row[1], 1e-12)
    rad = jnp.stack([row[2], row[3], row[4]], axis=-1)
    u_pos = u[..., 1:3]
    u_dir = u[..., 3:5]

    center = (aabb_min + aabb_max) * 0.5
    radius = 0.5 * jnp.linalg.norm(aabb_max - aabb_min) + 1e-3
    disk_area = jnp.pi * radius * radius

    o = jnp.zeros((n, 3))
    d = jnp.zeros((n, 3))
    w = jnp.zeros((n, 3))
    nrm = jnp.zeros((n, 3))
    valid = jnp.zeros((n,), dtype=bool)
    emit_w = jnp.zeros((n, 3))
    emission_pdf_w = jnp.zeros((n,))
    direct_pdf_a = jnp.zeros((n,))
    cos_light = jnp.zeros((n,))

    def put(sel, o_, d_, w_, n_):
        nonlocal o, d, w, nrm, valid
        o = jnp.where(sel[..., None], o_, o)
        d = jnp.where(sel[..., None], d_, d)
        w = jnp.where(sel[..., None], w_, w)
        nrm = jnp.where(sel[..., None], n_, nrm)
        valid = valid | sel

    def _disk_point(dir_in, u2):
        """Point on the bounding-sphere disk facing ``dir_in``."""
        f = Frame.from_normal(dir_in)
        dxy = square_to_uniform_disk_concentric(u2) * radius
        off = f.to_world(
            jnp.concatenate([dxy, jnp.zeros_like(dxy[..., :1])], axis=-1)
        )
        return center - dir_in * radius * 1.5 + off

    if EmitterKind.AREA in kinds:
        b = square_to_uniform_triangle(u_pos)
        q = jnp.stack(
            [
                row[14] + b[..., 0] * row[17] + b[..., 1] * row[20],
                row[15] + b[..., 0] * row[18] + b[..., 1] * row[21],
                row[16] + b[..., 0] * row[19] + b[..., 1] * row[22],
            ],
            axis=-1,
        )
        ng = jnp.stack([row[23], row[24], row[25]], axis=-1)
        d_local = square_to_cosine_hemisphere(u_dir)
        d_world = Frame.from_normal(ng).to_world(d_local)
        area = jnp.maximum(row[13], 1e-12)
        # Le cos / (pmf/A * cos/pi) = Le * pi * A / pmf
        w_a = rad * (jnp.pi * area / pmf)[..., None]
        sel_a = kind == EmitterKind.AREA
        put(sel_a, q + ng * 1e-4, d_world, w_a, ng)
        emit_w = jnp.where(sel_a[..., None], rad * (area / pmf)[..., None], emit_w)
        cos_a = jnp.maximum(d_local[..., 2], 0.0)
        emission_pdf_w = jnp.where(sel_a, pmf / area * cos_a / jnp.pi, emission_pdf_w)
        direct_pdf_a = jnp.where(sel_a, pmf / area, direct_pdf_a)
        cos_light = jnp.where(sel_a, cos_a, cos_light)

    if EmitterKind.POINT in kinds or EmitterKind.SPOT in kinds:
        pos = jnp.stack([row[5], row[6], row[7]], axis=-1)
        if EmitterKind.POINT in kinds:
            d_sph = square_to_uniform_sphere(u_dir)
            w_p = rad * (4.0 * jnp.pi / pmf)[..., None]
            sel_p = kind == EmitterKind.POINT
            put(sel_p, pos, d_sph, w_p, jnp.zeros_like(pos))
            emission_pdf_w = jnp.where(sel_p, pmf * INV_FOURPI, emission_pdf_w)
            direct_pdf_a = jnp.where(sel_p, pmf, direct_pdf_a)
            cos_light = jnp.where(sel_p, 1.0, cos_light)
        if EmitterKind.SPOT in kinds:
            axis = jnp.stack([row[8], row[9], row[10]], axis=-1)
            cos_total = row[11]
            cos_beam = row[12]
            # uniform cone sampling
            ct = 1.0 - u_dir[..., 0] * (1.0 - cos_total)
            st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
            ph = 2.0 * jnp.pi * u_dir[..., 1]
            local = jnp.stack([st * jnp.cos(ph), st * jnp.sin(ph), ct], axis=-1)
            d_cone = Frame.from_normal(axis).to_world(local)
            falloff = jnp.clip(
                (ct - cos_total) / jnp.maximum(cos_beam - cos_total, 1e-6), 0.0, 1.0
            )
            solid = 2.0 * jnp.pi * jnp.maximum(1.0 - cos_total, 1e-6)
            w_s = rad * (falloff * solid / pmf)[..., None]
            sel_s = kind == EmitterKind.SPOT
            put(sel_s, pos, d_cone, w_s, jnp.zeros_like(pos))
            emission_pdf_w = jnp.where(sel_s, pmf / solid, emission_pdf_w)
            direct_pdf_a = jnp.where(sel_s, pmf, direct_pdf_a)
            cos_light = jnp.where(sel_s, 1.0, cos_light)

    if EmitterKind.DIRECTIONAL in kinds:
        d_dl = jnp.stack([row[5], row[6], row[7]], axis=-1)  # emit direction
        o_dl = _disk_point(d_dl, u_pos)
        w_d = rad * (disk_area / pmf)[..., None]
        sel_dl = kind == EmitterKind.DIRECTIONAL
        put(sel_dl, o_dl, d_dl, w_d, d_dl)
        # VCM pdfs (SmallVCM DirectionalLight): position uniform on the
        # bounding disk, direction delta; direct pdf is the discrete NEE
        # pick probability.  bdpt's light-subpath recursion consumes these
        # (reference bdpt_proc.cpp delta-infinite strategies).
        emission_pdf_w = jnp.where(sel_dl, pmf / disk_area, emission_pdf_w)
        direct_pdf_a = jnp.where(sel_dl, pmf, direct_pdf_a)
        cos_light = jnp.where(sel_dl, 1.0, cos_light)

    if EmitterKind.COLLIMATED in kinds:
        # single delta ray (collimated.cpp sampleRay): origin + axis fixed,
        # weight = power / pmf; NEE/camera connections never reach it
        pos_c = jnp.stack([row[5], row[6], row[7]], axis=-1)
        axis_c = jnp.stack([row[8], row[9], row[10]], axis=-1)
        w_cl = rad / pmf[..., None]
        sel_cl = kind == EmitterKind.COLLIMATED
        put(sel_cl, pos_c, axis_c, w_cl, jnp.zeros_like(pos_c))
        emission_pdf_w = jnp.where(sel_cl, pmf, emission_pdf_w)
        direct_pdf_a = jnp.where(sel_cl, 0.0, direct_pdf_a)
        cos_light = jnp.where(sel_cl, 1.0, cos_light)

    infinite = jnp.zeros((n,), bool)

    if EmitterKind.CONSTANT in kinds:
        d_in = -square_to_uniform_sphere(u_dir)  # inward
        o_c = _disk_point(d_in, u_pos)
        w_c = rad * (disk_area * 4.0 * jnp.pi / pmf)[..., None]
        sel_c = kind == EmitterKind.CONSTANT
        put(sel_c, o_c, d_in, w_c, d_in)
        # VCM pdfs in the SmallVCM background-light convention: direct pdf
        # is the NEE solid-angle pdf; emission adds the disk-position pdf
        pd_c = pmf * INV_FOURPI
        direct_pdf_a = jnp.where(sel_c, pd_c, direct_pdf_a)
        emission_pdf_w = jnp.where(sel_c, pd_c / disk_area, emission_pdf_w)
        cos_light = jnp.where(sel_c, 1.0, cos_light)
        infinite = infinite | sel_c

    if EmitterKind.ENVMAP in kinds:
        from mitsuba_path_guiding_tpu.models.envmap import env_sample

        d_env, pdf_tex, rad_env = env_sample(em, u_dir)
        d_in_e = -d_env
        o_e = _disk_point(d_in_e, u_pos)
        w_e = rad_env * (disk_area / (jnp.maximum(pdf_tex, 1e-12) * pmf))[..., None]
        sel_e = kind == EmitterKind.ENVMAP
        put(sel_e, o_e, d_in_e, w_e, d_in_e)
        pd_e = pmf * pdf_tex
        direct_pdf_a = jnp.where(sel_e, pd_e, direct_pdf_a)
        emission_pdf_w = jnp.where(sel_e, pd_e / disk_area, emission_pdf_w)
        cos_light = jnp.where(sel_e, 1.0, cos_light)
        infinite = infinite | sel_e

    if EmitterKind.DIRECTIONAL in kinds:
        infinite = infinite | (kind == EmitterKind.DIRECTIONAL)

    return RaySample(
        o=o, d=d, weight=w, normal=nrm, valid=valid, emit_weight=emit_w,
        emission_pdf_w=emission_pdf_w, direct_pdf_a=direct_pdf_a,
        cos_light=cos_light, infinite=infinite,
    )
