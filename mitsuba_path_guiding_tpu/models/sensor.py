"""Sensor ray generation: perspective pinhole + thin-lens DoF.

Counterpart of /root/reference/src/sensors/{perspective,thinlens}.cpp
sampleRayDifferential.  Camera space: x-right, y-up, +z forward (see
scene/transforms.look_at); pixel (0,0) is the image's top-left.
"""
from __future__ import annotations

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.math import normalize
from mitsuba_path_guiding_tpu.core.warp import square_to_uniform_disk_concentric
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

    d_cam = jnp.stack(
        [
            ndc_x * sensor.tan_half_fov_x,
            ndc_y * sensor.tan_half_fov_x * aspect,
            jnp.ones_like(ndc_x),
        ],
        axis=-1,
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
