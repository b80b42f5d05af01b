"""Adjoint particle (light) tracer: emitter rays splatting onto the sensor.

TPU-native counterpart of the reference's ptracer plugin
(/root/reference/src/integrators/ptracer/ptracer.cpp + ptracer_proc.cpp)
built on the ParticleTracer random walk (particleproc.h:128-226): particles
start on emitters (Scene::sampleEmitterRay analogue models/emitter.py
sample_ray), random-walk through the scene, and connect every surface
vertex to the camera (handleSurfaceInteraction -> film splat).

Wavefront form: the walk is the same lax.scan shape as path.py; the
"connection" is a shadow ray to the camera plus a continuous film
coordinate, splatted with scatter-add after the scan.  The estimator
divides by the TOTAL particle count (each particle can splat anywhere on
the film), so the film here accumulates raw sums — develop_ptracer does
the division.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute, intersect_bvh, occluded
from mitsuba_path_guiding_tpu.core.math import Frame, dot, normalize
from mitsuba_path_guiding_tpu.core.rng import bounce_uniform, event_uniform
from mitsuba_path_guiding_tpu.integrators.path import INFD, _offset_ray
from mitsuba_path_guiding_tpu.models import bsdf as bsdf_mod
from mitsuba_path_guiding_tpu.models import emitter as em_mod
from mitsuba_path_guiding_tpu.models.sensor import connect_to_sensor
from mitsuba_path_guiding_tpu.scene.types import SceneData
from mitsuba_path_guiding_tpu.ops.gather_pallas import gather_rows_t

TAG_EMITTER_RAY = 4 << 20


@partial(
    jax.jit,
    static_argnames=("width", "height", "max_depth", "rr_depth", "use_bvh", "em_kinds", "mat_types"),
)
def trace_light(
    scene: SceneData,
    rkeys,
    width: int,
    height: int,
    max_depth: int = 5,
    rr_depth: int = 5,
    use_bvh: bool = False,
    em_kinds=em_mod.ALL_KINDS,
    mat_types=bsdf_mod.ALL_TYPES,
):
    """One wavefront of light particles.  Returns per-bounce splat data
    (film_xy (D, N, 2), rgb (D, 3, N), valid (D, N))."""
    geo, bvh, mats, em = scene.geo, scene.bvh, scene.mats, scene.emitters

    def intersect(o, d):
        return intersect_bvh(geo, bvh, o, d) if use_bvh else intersect_brute(geo, o, d)

    u0 = event_uniform(rkeys, TAG_EMITTER_RAY, 5)
    rs = em_mod.sample_ray(em, scene.aabb_min, scene.aabb_max, u0, kinds=em_kinds)
    n = rs.o.shape[0]

    # directly visible emitters: connect the emission vertex itself to the
    # sensor (reference ParticleTracer::handleEmission) — radiance only on
    # the normal side of area lights
    film_xy0, to_cam0, dist0, imp0, ok0 = connect_to_sensor(
        scene.sensor, width, height, rs.o
    )
    cos_q = dot(rs.normal, to_cam0)
    occ0 = occluded(geo, bvh, rs.o, to_cam0, dist0 * (1.0 - 1e-3), use_bvh=use_bvh)
    splat0_rgb = rs.emit_weight * (jnp.maximum(cos_q, 0.0) * imp0)[..., None]
    splat0_ok = rs.valid & ok0 & ~occ0 & (jnp.max(splat0_rgb, axis=-1) > 0.0)
    emission_splat = (
        film_xy0,
        jnp.stack([splat0_rgb[..., 0], splat0_rgb[..., 1], splat0_rgb[..., 2]], axis=0),
        splat0_ok,
    )

    def bounce(carry, depth):
        o, d, T, alive = carry
        u = bounce_uniform(rkeys, depth, 9)
        hit = intersect(o, d)
        act = alive & hit.valid

        t_hit = jnp.where(hit.valid, hit.t, 1.0)
        p = o + t_hit[..., None] * d
        row = gather_rows_t(geo.shade_packed, jnp.maximum(hit.prim, 0))
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
        ns = jnp.where(dot(ns, ng)[..., None] < 0.0, -ns, ns)
        mid = row[18].astype(jnp.int32)
        frame = Frame.from_normal(ns)
        wi_local = frame.to_local(-d)

        # --- connect to the sensor (handleSurfaceInteraction analogue)
        film_xy, to_cam, dist_cam, imp, valid_cam = connect_to_sensor(
            scene.sensor, width, height, p
        )
        wo_cam_local = frame.to_local(to_cam)
        # importance transport: reuse eval (reciprocal BSDFs; the
        # non-reciprocal refraction factor only matters for dielectric
        # TRANSMISSION, which delta lobes exclude from eval anyway)
        f_cam, _ = bsdf_mod.eval_pdf(mats, mid, wi_local, wo_cam_local, types=mat_types)
        o_sh = _offset_ray(p, ng, to_cam)
        occ = occluded(geo, bvh, o_sh, to_cam, dist_cam * (1.0 - 1e-3), use_bvh=use_bvh)
        splat_rgb = T * f_cam * imp[..., None]
        splat_ok = act & valid_cam & ~occ & (jnp.max(splat_rgb, axis=-1) > 0.0)

        # --- continue the walk (BSDF importance sampling)
        bs = bsdf_mod.sample(mats, mid, wi_local, u[..., 3:6], types=mat_types)
        wo_world = frame.to_world(bs.wo)
        T_new = T * bs.weight
        cont = act & (bs.pdf > 0.0) & (jnp.max(jnp.abs(T_new), axis=-1) > 0.0)
        rr_active = depth >= rr_depth
        q = jnp.clip(jnp.max(T_new, axis=-1), 0.05, 0.95)
        rr_pass = u[..., 8] < q
        T_new = jnp.where(
            (rr_active & cont)[..., None], T_new / jnp.maximum(q, 1e-6)[..., None], T_new
        )
        cont = cont & jnp.where(rr_active, rr_pass, True)

        o_next = _offset_ray(p, ng, wo_world)
        carry_new = (
            jnp.where(cont[..., None], o_next, o),
            jnp.where(cont[..., None], wo_world, d),
            jnp.where(cont[..., None], T_new, T),
            cont,
        )
        out = (
            film_xy,
            jnp.stack([splat_rgb[..., 0], splat_rgb[..., 1], splat_rgb[..., 2]], axis=0),
            splat_ok,
        )
        return carry_new, out

    carry0 = (rs.o, rs.d, jnp.where(rs.valid[..., None], rs.weight, 0.0), rs.valid)
    _, outs = jax.lax.scan(bounce, carry0, jnp.arange(max_depth))
    # prepend the emission-vertex splat as one more "bounce" row
    return tuple(
        jnp.concatenate([e[None], b], axis=0) for e, b in zip(emission_splat, outs)
    )


def render_ptracer(scene: SceneData, cfg, n_particles: int | None = None):
    """Full light-traced render; cfg is a RenderConfig (spp interpreted as
    particles-per-pixel).  Returns (H, W, 3)."""
    import numpy as np

    from mitsuba_path_guiding_tpu.core import rng
    from mitsuba_path_guiding_tpu.film.film import splat_raw
    from mitsuba_path_guiding_tpu.models.bsdf import types_present
    from mitsuba_path_guiding_tpu.models.emitter import kinds_present

    w, h = cfg.width, cfg.height
    n_total = n_particles or (w * h * cfg.spp)
    use_bvh = cfg.use_bvh
    if use_bvh is None:
        from mitsuba_path_guiding_tpu.integrators.render import BRUTE_FORCE_MAX_TRIS

        use_bvh = int(scene.geo.p0.shape[0]) > BRUTE_FORCE_MAX_TRIS
    em_kinds = kinds_present(scene.emitters)
    mat_types = types_present(scene.mats)

    key = rng.base_key(cfg.seed)
    batch = min(n_total, cfg.pixel_batch)
    acc = jnp.zeros((h * w, 3), jnp.float32)
    done = 0
    wave = 0
    while done < n_total:
        m = min(batch, n_total - done)
        pid = jnp.arange(m, dtype=jnp.int32)
        rkeys = rng.ray_keys(key, pid, jnp.full((m,), wave, jnp.int32))
        film_xy, rgb, ok = trace_light(
            scene, rkeys, w, h,
            max_depth=cfg.max_depth, rr_depth=cfg.rr_depth,
            use_bvh=use_bvh, em_kinds=em_kinds, mat_types=mat_types,
        )
        D = film_xy.shape[0]
        xy = film_xy.reshape(D * m, 2)
        val = jnp.moveaxis(rgb, 1, 2).reshape(D * m, 3)
        good = ok.reshape(D * m)
        acc = splat_raw(acc, xy, jnp.where(good[..., None], val, 0.0), w, h)
        done += m
        wave += 1
    img = acc.reshape(h, w, 3) / jnp.float32(n_total)
    return img
