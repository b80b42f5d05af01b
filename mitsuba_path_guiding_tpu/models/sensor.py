"""Sensor ray generation: perspective pinhole + thin-lens DoF.

Counterpart of /root/reference/src/sensors/{perspective,thinlens}.cpp
sampleRayDifferential.  Camera space: x-right, y-up, +z forward (see
scene/transforms.look_at); pixel (0,0) is the image's top-left.
"""
from __future__ import annotations

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.math import normalize
from mitsuba_path_guiding_tpu.core.warp import (
    square_to_cosine_hemisphere,
    square_to_uniform_disk_concentric,
    square_to_uniform_sphere,
)
from mitsuba_path_guiding_tpu.scene.types import Sensor, SensorKind


def generate_rays(
    sensor: Sensor,
    width: int,
    height: int,
    pixel_id: jnp.ndarray,
    u_pos: jnp.ndarray,
    u_lens: jnp.ndarray | None = None,
    kind: int = SensorKind.PERSPECTIVE,
):
    """Primary rays for flat pixel ids with sub-pixel jitter.

    pixel_id: (N,) int32 = y*width + x.  u_pos: (N,2) jitter in [0,1).
    Returns (origin (N,3), direction (N,3), film_xy (N,2) continuous
    position for reconstruction-filter splatting)."""
    px = (pixel_id % width).astype(jnp.float32)
    py = (pixel_id // width).astype(jnp.float32)
    fx = px + u_pos[..., 0]
    fy = py + u_pos[..., 1]
    # NDC in [-1,1], y flipped (film row 0 = top = +y in camera space)
    ndc_x = 2.0 * fx / width - 1.0
    ndc_y = 1.0 - 2.0 * fy / height
    aspect = height / width
    R = sensor.to_world[:3, :3]
    t = sensor.to_world[:3, 3]
    film_xy = jnp.stack([fx, fy], axis=-1)

    if kind == SensorKind.ORTHOGRAPHIC:
        # parallel rays along +z; tan_half_fov_x doubles as half-width
        o_cam = jnp.stack(
            [
                ndc_x * sensor.tan_half_fov_x,
                ndc_y * sensor.tan_half_fov_x * aspect,
                jnp.zeros_like(ndc_x),
            ],
            axis=-1,
        )
        d_cam = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), o_cam.shape)
        return o_cam @ R.T + t, normalize(d_cam @ R.T), film_xy

    if kind == SensorKind.SPHERICAL:
        # lat-long 360 capture (reference spherical.cpp): u->phi, v->theta
        theta = (fy / height) * jnp.pi
        phi = (fx / width) * 2.0 * jnp.pi - jnp.pi
        st = jnp.sin(theta)
        d_cam = jnp.stack(
            [st * jnp.sin(phi), jnp.cos(theta), -st * jnp.cos(phi)], axis=-1
        )
        o_world = jnp.broadcast_to(t, d_cam.shape)
        return o_world, normalize(d_cam @ R.T), film_xy

    if kind == SensorKind.TELECENTRIC:
        # orthographic view focused on a plane at focus_distance; points off
        # that plane blur by the aperture (reference telecentric.cpp)
        o_cam = jnp.stack(
            [
                ndc_x * sensor.tan_half_fov_x,
                ndc_y * sensor.tan_half_fov_x * aspect,
                jnp.zeros_like(ndc_x),
            ],
            axis=-1,
        )
        if u_lens is None:
            u_lens = u_pos[..., ::-1] * 0.0 + 0.5  # degenerate: pinhole center
        lens = square_to_uniform_disk_concentric(u_lens) * sensor.aperture_radius
        focus_p = o_cam + jnp.asarray([0.0, 0.0, 1.0]) * sensor.focus_distance
        o_cam = o_cam + jnp.concatenate(
            [lens, jnp.zeros_like(lens[..., :1])], axis=-1
        )
        d_cam = focus_p - o_cam
        return o_cam @ R.T + t, normalize(d_cam @ R.T), film_xy

    if kind == SensorKind.RADIANCEMETER:
        # one fixed look direction (+z); every sample measures the same ray
        d_cam = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (fx.shape[0], 3))
        return jnp.broadcast_to(t, d_cam.shape), normalize(d_cam @ R.T), film_xy

    if kind == SensorKind.FLUENCEMETER:
        # fluence probe: uniform sphere directions from a point; the image
        # mean is the fluence / 4pi (meas_scale carries the 4pi)
        d_cam = square_to_uniform_sphere(u_pos)
        return jnp.broadcast_to(t, d_cam.shape), normalize(d_cam @ R.T), film_xy

    if kind == SensorKind.IRRADIANCEMETER:
        # cosine-hemisphere importance sampling around +z: irradiance
        # E = pi * mean(L); meas_scale = pi is applied at develop time
        d_cam = square_to_cosine_hemisphere(u_pos)
        return jnp.broadcast_to(t, d_cam.shape), normalize(d_cam @ R.T), film_xy

    d_cam = jnp.stack(
        [
            ndc_x * sensor.tan_half_fov_x,
            ndc_y * sensor.tan_half_fov_x * aspect,
            jnp.ones_like(ndc_x),
        ],
        axis=-1,
    )
    if sensor.kc is not None:
        # radial distortion (perspective_rdist.cpp): scale the image-plane
        # offset by the kc polynomial in r^2
        r2 = d_cam[..., 0] ** 2 + d_cam[..., 1] ** 2
        f = 1.0 + sensor.kc[0] * r2 + sensor.kc[1] * r2 * r2
        d_cam = jnp.stack(
            [d_cam[..., 0] * f, d_cam[..., 1] * f, d_cam[..., 2]], axis=-1
        )
    o_cam = jnp.zeros_like(d_cam)
    if u_lens is not None:
        # thin lens: offset origin on the aperture disk, refocus
        # (reference thinlens.cpp:sampleRay)
        lens = square_to_uniform_disk_concentric(u_lens) * sensor.aperture_radius
        focus_p = d_cam * (sensor.focus_distance / d_cam[..., 2:3])
        o_cam = jnp.concatenate([lens, jnp.zeros_like(lens[..., :1])], axis=-1)
        d_cam = focus_p - o_cam

    d_world = normalize(d_cam @ R.T)
    o_world = o_cam @ R.T + t
    return o_world, d_world, film_xy


def connect_to_sensor(sensor: Sensor, width: int, height: int, p: jnp.ndarray):
    """Adjoint sensor query (reference perspective.cpp::sampleDirect — the
    hook the ptracer/bdpt light-image strategies use): project world
    points onto the film of a perspective pinhole.

    Returns (film_xy (N,2), dir_to_cam (N,3), dist (N,), importance (N,),
    valid (N,)).  ``importance`` is We·G/cos_x folded together so a light
    vertex with throughput alpha splats
        C = alpha * f_eval(x -> cam) * V * importance
    at film_xy, where f_eval includes |cos_x| (this build's BSDF eval
    convention) and the estimator divides by the total particle count:
        importance = 1 / (A_pix_plane * cos^4(theta) * d^2) * cos(theta)
                   = 1 / (A_pix_plane * cos^3(theta) * d^2).
    (one cos^3 from the solid-angle->film-area Jacobian, one cos/d^2 from
    the geometry term at the camera, 1/cos_x cancelled against f_eval.)
    """
    R = sensor.to_world[:3, :3]
    t = sensor.to_world[:3, 3]
    w = p - t
    d_cam = w @ R  # camera-space vector (R^T w)
    z = d_cam[..., 2]
    valid = z > sensor.near_clip
    zs = jnp.where(valid, z, 1.0)
    aspect = height / width
    tanx = sensor.tan_half_fov_x
    ndc_x = d_cam[..., 0] / (zs * tanx)
    ndc_y = d_cam[..., 1] / (zs * tanx * aspect)
    fx = (ndc_x + 1.0) * 0.5 * width
    fy = (1.0 - ndc_y) * 0.5 * height
    valid = valid & (fx >= 0) & (fx < width) & (fy >= 0) & (fy < height)
    dist = jnp.linalg.norm(w, axis=-1)
    dir_to_cam = -w / jnp.maximum(dist, 1e-12)[..., None]
    cos_t = zs / jnp.maximum(dist, 1e-12)
    a_pix = (2.0 * tanx / width) * (2.0 * tanx * aspect / height)
    imp = 1.0 / jnp.maximum(a_pix * cos_t**3 * dist * dist, 1e-12)
    film_xy = jnp.stack([fx, fy], axis=-1)
    return film_xy, dir_to_cam, dist, jnp.where(valid, imp, 0.0), valid
