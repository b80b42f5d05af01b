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


def sample_direct(
    em: Emitters, geo: Geometry, p: jnp.ndarray, u: jnp.ndarray
) -> DirectSample:
    """Draw one emitter sample per lane.  ``u``: (N,3) uniforms
    (u[...,0] picks the emitter, u[...,1:3] the position)."""
    n = p.shape[0]
    eid = jnp.clip(
        jnp.searchsorted(em.cdf, u[..., 0], side="right"), 0, em.kind.shape[0] - 1
    ).astype(jnp.int32)
    kind = em.kind[eid]
    pmf = em.pmf[eid]
    rad = em.radiance[eid]
    u2 = u[..., 1:3]

    # ---- AREA: uniform point on the triangle
    tri = jnp.maximum(em.tri[eid], 0)
    b = square_to_uniform_triangle(u2)
    q = geo.p0[tri] + b[..., 0:1] * geo.e1[tri] + b[..., 1:2] * geo.e2[tri]
    ng = jnp.cross(geo.e1[tri], geo.e2[tri])
    ng = normalize(ng)
    to_q = q - p
    dist2 = jnp.maximum(dot(to_q, to_q), 1e-12)
    dist = jnp.sqrt(dist2)
    dir_a = to_q / dist[..., None]
    cos_l = dot(ng, -dir_a)
    area = jnp.maximum(em.area[eid], 1e-12)
    # area pdf -> solid angle (reference shape.cpp pdfDirect conversion)
    pdf_a = pmf * dist2 / jnp.maximum(jnp.abs(cos_l) * area, 1e-12)
    rad_a = jnp.where((cos_l > 0.0)[..., None], rad, 0.0)

    # ---- POINT: delta; fold 1/dist^2 into radiance
    to_l = em.position[eid] - p
    d2p = jnp.maximum(dot(to_l, to_l), 1e-12)
    distp = jnp.sqrt(d2p)
    dir_p = to_l / distp[..., None]
    rad_p = rad / d2p[..., None]

    # ---- CONSTANT env: uniform sphere direction
    dir_e = square_to_uniform_sphere(u2)
    pdf_e = pmf * INV_FOURPI

    # ---- DIRECTIONAL: delta direction = -emitter dir
    dir_d = -em.position[eid]

    # ---- SPOT: like point with falloff
    axis = em.aux[eid]
    cos_total = em.cutoff[eid, ..., 0]
    cos_beam = em.cutoff[eid, ..., 1]
    cd = dot(axis, -dir_p)
    falloff = jnp.clip(
        (cd - cos_total) / jnp.maximum(cos_beam - cos_total, 1e-6), 0.0, 1.0
    )
    rad_s = rad / d2p[..., None] * jnp.where(cd > cos_total, falloff, 0.0)[..., None]

    is_area = kind == EmitterKind.AREA
    is_point = kind == EmitterKind.POINT
    is_env = kind == EmitterKind.CONSTANT
    is_dir = kind == EmitterKind.DIRECTIONAL
    is_spot = kind == EmitterKind.SPOT

    direction = jnp.where(
        is_area[..., None], dir_a,
        jnp.where(is_env[..., None], dir_e,
        jnp.where(is_dir[..., None], dir_d, dir_p)),
    )
    INFD = jnp.float32(3.0e37)
    distance = jnp.where(is_area, dist, jnp.where(is_env | is_dir, INFD, distp))
    radiance = jnp.where(
        is_area[..., None], rad_a,
        jnp.where(is_env[..., None], rad,
        jnp.where(is_spot[..., None], rad_s,
        jnp.where(is_dir[..., None], rad, rad_p))),
    )
    pdf = jnp.where(is_area, pdf_a, jnp.where(is_env, pdf_e, pmf))
    is_delta = is_point | is_dir | is_spot
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


def pdf_env(em: Emitters):
    """Solid-angle NEE pdf of sampling the environment in a given direction
    (constant env: uniform; 0 when the scene has no env emitter)."""
    return em.env_pdf


def eval_env(em: Emitters, wo_world):
    """Environment radiance for escaped rays."""
    return jnp.broadcast_to(em.env_radiance, wo_world.shape)
