"""Phase functions: isotropic, Henyey-Greenstein, Rayleigh.

Counterpart of /root/reference/src/phase/{isotropic,hg,rayleigh}.cpp (base
class include/mitsuba/render/phase.h:117; kkay/microflake need an oriented
fiber field and are documented stretch).  Convention matches the reference:
``wi`` points toward the previous vertex, ``wo`` away from the collision;
HG's g > 0 is forward scattering, i.e. the pdf peaks at wo ~ -wi
(cos(theta) = dot(-wi, wo)).  All three are perfectly importance-sampled
(eval == pdf, sample weight 1); the medium's static ``phase_kind`` picks
the family at trace time (PhaseKind below).
"""
from __future__ import annotations

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.math import Frame, dot
from mitsuba_path_guiding_tpu.core.warp import INV_FOURPI, square_to_uniform_sphere


class PhaseKind:
    HG = 0         # hg.cpp (g == 0 degenerates to isotropic.cpp)
    RAYLEIGH = 1   # rayleigh.cpp


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


# ---------------------------------------------------------------------------
# Rayleigh (reference src/phase/rayleigh.cpp): p(cos) = 3/(16pi)(1 + cos^2)
# ---------------------------------------------------------------------------

def rayleigh_eval(wi: jnp.ndarray, wo: jnp.ndarray) -> jnp.ndarray:
    c = dot(-wi, wo)
    return 3.0 / (16.0 * jnp.pi) * (1.0 + c * c)


def rayleigh_sample(wi: jnp.ndarray, u: jnp.ndarray):
    """Exact inverse-CDF sampling of cos(theta): the CDF of
    p(c) ∝ 1 + c^2 on [-1,1] inverts via Cardano (rayleigh.cpp sample)."""
    # solve c^3/3 + c = (8u - 4)/3  =>  c = z - 1/z with
    # z = (v + sqrt(v^2 + 1))^(1/3), v = (4u - 2)  [standard depolarized fit]
    v = 2.0 * (2.0 * u[..., 0] - 1.0)
    z = jnp.cbrt(v + jnp.sqrt(v * v + 1.0))
    cos_t = jnp.clip(z - 1.0 / z, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u[..., 1]
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    wo = Frame.from_normal(-wi).to_world(local)
    return wo, rayleigh_eval(wi, wo)


def phase_eval_kind(wi, wo, g, kind: int = PhaseKind.HG):
    """Static-kind dispatch used by the volumetric integrator."""
    if kind == PhaseKind.RAYLEIGH:
        return rayleigh_eval(wi, wo)
    return phase_eval(wi, wo, g)


def phase_sample_kind(wi, g, u, kind: int = PhaseKind.HG):
    if kind == PhaseKind.RAYLEIGH:
        return rayleigh_sample(wi, u)
    return phase_sample(wi, g, u)
