"""GGX / Beckmann microfacet distributions with Smith shadowing and VNDF
sampling.

Counterpart of /root/reference/src/bsdfs/microfacet.h (used by
roughconductor/roughdielectric/roughplastic/roughcoating).  The reference
samples the full NDF with Walter's trick; here we sample the *visible* NDF
(Heitz 2018) — strictly lower variance, and branch-free for TPU.

All directions are in the local shading frame (+z = normal).
"""
from __future__ import annotations

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.math import (
    abs_cos_theta,
    cos_theta,
    dot,
    normalize,
    safe_sqrt,
)

ALPHA_MIN = 1e-4


def ggx_d(m: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """GGX NDF D(m) (isotropic)."""
    a2 = alpha * alpha
    c2 = jnp.maximum(cos_theta(m), 0.0) ** 2
    denom = jnp.pi * (c2 * (a2 - 1.0) + 1.0) ** 2
    return jnp.where(cos_theta(m) > 0.0, a2 / jnp.maximum(denom, 1e-20), 0.0)


def ggx_lambda(w: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Smith Lambda for GGX."""
    c = cos_theta(w)
    c2 = c * c
    t2 = jnp.maximum(1.0 - c2, 0.0) / jnp.maximum(c2, 1e-12)
    return 0.5 * (jnp.sqrt(1.0 + alpha * alpha * t2) - 1.0)


def ggx_g1(w: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / (1.0 + ggx_lambda(w, alpha))


def ggx_g2(wi: jnp.ndarray, wo: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Height-correlated Smith G2."""
    return 1.0 / (1.0 + ggx_lambda(wi, alpha) + ggx_lambda(wo, alpha))


def ggx_sample_vndf(wi: jnp.ndarray, alpha: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Sample the GGX visible normal distribution (Heitz 2018 sphere method).

    ``wi`` must be in the upper hemisphere (flip before calling)."""
    a = alpha[..., None]
    vh = normalize(jnp.stack([a[..., 0] * wi[..., 0], a[..., 0] * wi[..., 1], wi[..., 2]], axis=-1))
    # orthonormal basis around vh
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 1e-14)[..., None],
        jnp.stack([-vh[..., 1] * inv, vh[..., 0] * inv, jnp.zeros_like(inv)], axis=-1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * safe_sqrt(1.0 - p1 * p1) + s * p2
    p3 = safe_sqrt(1.0 - p1 * p1 - p2 * p2)
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * vh
    m = normalize(
        jnp.stack(
            [a[..., 0] * nh[..., 0], a[..., 0] * nh[..., 1], jnp.maximum(nh[..., 2], 1e-6)],
            axis=-1,
        )
    )
    return m


def ggx_vndf_pdf(wi: jnp.ndarray, m: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """pdf of ggx_sample_vndf in the half-vector measure:
    G1(wi) D(m) max(0, wi.m) / cos_theta(wi)."""
    ci = jnp.maximum(cos_theta(wi), 1e-6)
    return ggx_g1(wi, alpha) * ggx_d(m, alpha) * jnp.maximum(dot(wi, m), 0.0) / ci


def beckmann_d(m: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    a2 = alpha * alpha
    c = cos_theta(m)
    c2 = jnp.maximum(c * c, 1e-12)
    t2 = (1.0 - c2) / c2
    return jnp.where(
        c > 0.0,
        jnp.exp(-t2 / a2) / jnp.maximum(jnp.pi * a2 * c2 * c2, 1e-20),
        0.0,
    )


def beckmann_g1(w: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    c = abs_cos_theta(w)
    t = safe_sqrt(1.0 - c * c) / jnp.maximum(c, 1e-12)
    a = 1.0 / jnp.maximum(alpha * t, 1e-12)
    poly = (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a)
    return jnp.where(a < 1.6, poly, 1.0)
