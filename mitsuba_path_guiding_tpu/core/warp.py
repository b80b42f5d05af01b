"""Sample warping: unit square -> distributions on disks/spheres/cones.

TPU-native counterpart of /root/reference/include/mitsuba/core/warp.h:40-101
and src/libcore/warp.cpp.  All functions are pure, batched over leading axes,
and paired with their PDFs so chi-square tests (tests/test_warp.py, modeled
on the reference's test_chisquare.cpp) can verify sample/pdf agreement.

Convention: ``u`` is a (..., 2) array of uniforms in [0,1); directions are
unit (..., 3) arrays in a local frame with +z the pole.
"""
from __future__ import annotations

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.math import safe_sqrt

INV_PI = 1.0 / jnp.pi
INV_TWOPI = 1.0 / (2.0 * jnp.pi)
INV_FOURPI = 1.0 / (4.0 * jnp.pi)


def square_to_uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf(d):
    return jnp.full(d.shape[:-1], INV_FOURPI)


def square_to_uniform_hemisphere(u):
    z = u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_hemisphere_pdf(d):
    return jnp.where(d[..., 2] >= 0.0, INV_TWOPI, 0.0)


def square_to_uniform_disk_concentric(u):
    """Shirley-Chiu concentric disk mapping (low distortion)."""
    x = 2.0 * u[..., 0] - 1.0
    y = 2.0 * u[..., 1] - 1.0
    zero = (x == 0.0) & (y == 0.0)
    use_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(use_x, x, y)
    safe = lambda a, b: a / jnp.where(jnp.abs(b) < 1e-12, 1.0, b)
    phi = jnp.where(
        use_x,
        (jnp.pi / 4.0) * safe(y, x),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * safe(x, y),
    )
    r = jnp.where(zero, 0.0, r)
    phi = jnp.where(zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_pdf(p):
    return jnp.full(p.shape[:-1], INV_PI)


def square_to_cosine_hemisphere(u):
    """Malley's method via the concentric disk (warp.cpp squareToCosineHemisphere)."""
    p = square_to_uniform_disk_concentric(u)
    z = safe_sqrt(1.0 - p[..., 0] ** 2 - p[..., 1] ** 2)
    return jnp.stack([p[..., 0], p[..., 1], z], axis=-1)


def square_to_cosine_hemisphere_pdf(d):
    return jnp.maximum(d[..., 2], 0.0) * INV_PI


def square_to_uniform_cone(u, cos_cutoff):
    """Uniform on the spherical cap cos(theta) in [cos_cutoff, 1]."""
    z = 1.0 - u[..., 0] * (1.0 - cos_cutoff)
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_cone_pdf(d, cos_cutoff):
    inside = d[..., 2] >= cos_cutoff
    return jnp.where(inside, INV_TWOPI / jnp.maximum(1.0 - cos_cutoff, 1e-12), 0.0)


def square_to_uniform_triangle(u):
    """Barycentric coords uniform on the unit triangle (warp.cpp)."""
    su = safe_sqrt(u[..., 0])
    b0 = 1.0 - su
    b1 = u[..., 1] * su
    return jnp.stack([b0, b1], axis=-1)


def square_to_std_normal(u):
    """Box-Muller transform -> 2D standard normal."""
    r = safe_sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-20)))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def interval_to_tent(u):
    """[0,1) -> [-1,1] tent-distributed, monotone inverse CDF."""
    return jnp.where(
        u < 0.5,
        safe_sqrt(2.0 * u) - 1.0,
        1.0 - safe_sqrt(jnp.maximum(2.0 - 2.0 * u, 0.0)),
    )
