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

from mitsuba_path_guiding_tpu.core.math import dot, normalize
from mitsuba_path_guiding_tpu.core.warp import (
    INV_FOURPI,
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


from functools import partial as _partial

import jax as _jax

ALL_KINDS = (
    EmitterKind.AREA,
    EmitterKind.POINT,
    EmitterKind.CONSTANT,
    EmitterKind.DIRECTIONAL,
    EmitterKind.SPOT,
)


def kinds_present(em: Emitters):
    """Static tuple of emitter kinds in a (host-concrete) scene — pass to
    sample_direct/trace so jit specializes away absent branches."""
    import numpy as np

    return tuple(sorted(set(np.asarray(em.kind).tolist())))


def sample_direct(
    em: Emitters, geo: Geometry, p: jnp.ndarray, u: jnp.ndarray, kinds=ALL_KINDS
) -> DirectSample:
    """Draw one emitter sample per lane.  ``u``: (N,3) uniforms
    (u[...,0] picks the emitter, u[...,1:3] the position).  ``kinds`` is a
    static tuple of EmitterKind values present in the scene: only those
    branches are compiled (the common area+env scene skips 3/5 of this)."""
    n = p.shape[0]
    eid = jnp.clip(
        jnp.searchsorted(em.cdf, u[..., 0], side="right"), 0, em.kind.shape[0] - 1
    ).astype(jnp.int32)
    # single packed row gather (Emitters.packed layout) — separate field
    # gathers materialize lane-padded (N,3) arrays on TPU
    row = em.packed[eid].T  # (32, N)
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
        put(kind == EmitterKind.AREA, dir_a, dist, rad_a, pdf_a, false)

    if EmitterKind.POINT in kinds or EmitterKind.SPOT in kinds:
        pos = jnp.stack([row[5], row[6], row[7]], axis=-1)
        to_l = pos - p
        d2p = jnp.maximum(dot(to_l, to_l), 1e-12)
        distp = jnp.sqrt(d2p)
        dir_p = to_l / distp[..., None]
        if EmitterKind.POINT in kinds:
            put(kind == EmitterKind.POINT, dir_p, distp, rad / d2p[..., None], pmf, true)
        if EmitterKind.SPOT in kinds:
            axis = jnp.stack([row[8], row[9], row[10]], axis=-1)
            cos_total = row[11]
            cos_beam = row[12]
            cd = dot(axis, -dir_p)
            falloff = jnp.clip(
                (cd - cos_total) / jnp.maximum(cos_beam - cos_total, 1e-6), 0.0, 1.0
            )
            rad_s = rad / d2p[..., None] * jnp.where(cd > cos_total, falloff, 0.0)[..., None]
            put(kind == EmitterKind.SPOT, dir_p, distp, rad_s, pmf, true)

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
