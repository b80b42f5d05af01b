"""Motion vectors + motion blur over animated scenes.

Counterpart of the reference's ``motion`` field integrator
(/root/reference/src/integrators/misc/motion.cpp:563 — screen-space motion
vectors of the first hit between two shutter times) and of its deformable
/ space-time motion-blur machinery (shapes/deformable.cpp + the 4D
sahkdtree4.h).

TPU-native re-design: geometry interpolation happens HOST-side — the
scene compiles at concrete times and the device kernels stay identical:
- render_motion: intersect at t0, advect each hit point by the per-shape
  transform delta (same primitive, same barycentrics), reproject through
  the t1 camera -> per-pixel (dx, dy) film-space vectors.
- render_motion_blur: stratified time slices over the shutter, each a
  full wavefront render of the scene baked at a jittered slice time; the
  slice average converges to the shutter integral (the 4D kd-tree's exact
  per-ray time becomes stratified-time wavefronts).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA
from mitsuba_path_guiding_tpu.scene.animation import AnimatedTransform, scene_at_time


def render_motion(desc: dict, cfg, t0: float = 0.0, t1: float = 1.0):
    """(H, W, 3): film-space motion (dx, dy, 0) of the first hit from
    shutter time t0 to t1 (misc/motion.cpp output convention)."""
    from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute
    from mitsuba_path_guiding_tpu.models.sensor import connect_to_sensor, generate_rays
    from mitsuba_path_guiding_tpu.scene.builder import build_scene

    scene0 = build_scene(scene_at_time(desc, t0))
    scene1 = build_scene(scene_at_time(desc, t1))
    w, h = cfg.width, cfg.height
    n_pix = w * h
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    rkeys = rng.ray_keys(rng.base_key(cfg.seed), pix, jnp.zeros_like(pix))
    u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2) * 0.0 + 0.5  # pixel centers
    o, d, film0 = generate_rays(
        scene0.sensor, w, h, pix, u_cam, kind=int(scene0.sensor.kind)
    )
    hit = intersect_brute(scene0.geo, o, d)
    t_hit = jnp.where(hit.valid, hit.t, 0.0)
    # hit point at t0, advected to t1 with the same (prim, barycentrics):
    # both compiles share topology, so prim indexes the t1 soup directly
    prim = jnp.maximum(hit.prim, 0)
    b1, b2 = hit.u, hit.v
    p1 = (
        scene1.geo.p0[prim]
        + b1[..., None] * scene1.geo.e1[prim]
        + b2[..., None] * scene1.geo.e2[prim]
    )
    film1, _, _, _, ok1 = connect_to_sensor(scene1.sensor, w, h, p1)
    dxy = jnp.where(
        (hit.valid & ok1)[..., None], film1 - film0, 0.0
    )
    out = jnp.concatenate([dxy, jnp.zeros_like(dxy[..., :1])], axis=-1)
    return out.reshape(h, w, 3)


def render_motion_blur(
    desc: dict, cfg, shutter=(0.0, 1.0), time_bins: int = 8, guide=None
):
    """Stratified-time motion blur: ``time_bins`` wavefront renders at
    jittered slice times, averaged.  Unbiased for the shutter integral as
    bins x passes grow (each slice re-jitters its time per seed)."""
    from mitsuba_path_guiding_tpu.integrators.render import render
    from mitsuba_path_guiding_tpu.scene.builder import build_scene

    t0, t1 = shutter
    acc = None
    rs = np.random.default_rng(cfg.seed)
    for b in range(time_bins):
        tb = t0 + (b + rs.random()) / time_bins * (t1 - t0)
        scene_b = build_scene(scene_at_time(desc, tb))
        img = render(scene_b, cfg._replace(seed=cfg.seed + 101 * b))
        acc = img if acc is None else acc + img
    return acc / time_bins
