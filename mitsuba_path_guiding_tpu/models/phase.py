"""Phase functions: isotropic and Henyey-Greenstein.

Counterpart of /root/reference/src/phase/{isotropic,hg}.cpp (base class
include/mitsuba/render/phase.h:117).  Convention matches the reference:
``wi`` points toward the previous vertex, ``wo`` away from the collision;
HG's g > 0 is forward scattering, i.e. the pdf peaks at wo ~ -wi
(cos(theta) = dot(-wi, wo)).  For both functions eval == pdf (perfect
importance sampling), so sample weights are 1.
"""
from __future__ import annotations

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.math import Frame, dot
from mitsuba_path_guiding_tpu.core.warp import INV_FOURPI, square_to_uniform_sphere


def hg_pdf(cos_theta: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """HG phase value for cos_theta = dot(-wi, wo): peak at cos_theta = 1
    (forward) for g > 0 — p = (1-g^2) / (4pi (1 + g^2 - 2 g cos)^1.5)."""
    g = jnp.clip(g, -0.999, 0.999)
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    return INV_FOURPI * (1.0 - g * g) / jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)


def phase_eval(wi: jnp.ndarray, wo: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """pdf == eval; isotropic when |g| ~ 0."""
    c = dot(-wi, wo)
    iso = jnp.abs(g) < 1e-4
    return jnp.where(iso, INV_FOURPI, hg_pdf(c, g))


def phase_sample(wi: jnp.ndarray, g: jnp.ndarray, u: jnp.ndarray):
    """Sample wo; returns (wo, pdf).  u: (..., 2)."""
    g = jnp.clip(g, -0.999, 0.999)
    # HG inverse CDF (hg.cpp sample); sign-preserving guard on 2g
    sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u[..., 0])
    two_g = jnp.where(jnp.abs(g) < 1e-6, 1e-6, 2.0 * g)
    cos_t_hg = (1.0 + g * g - sqr * sqr) / two_g
    cos_t_iso = 1.0 - 2.0 * u[..., 0]
    iso = jnp.abs(g) < 1e-4
    cos_t = jnp.where(iso, cos_t_iso, jnp.clip(cos_t_hg, -1.0, 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u[..., 1]
    local = jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
    )
    # frame around the forward direction (-wi)
    wo = Frame.from_normal(-wi).to_world(local)
    return wo, phase_eval(wi, wo, g)
