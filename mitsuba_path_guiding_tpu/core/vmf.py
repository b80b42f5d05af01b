"""von Mises-Fisher distribution on S^2: eval / sample / moment fitting.

Counterpart of /root/reference/include/mitsuba/core/vmf.h:44-68 (+ vmf.cpp),
the building block of the path-guiding directional mixtures (SURVEY.md §7).
All functions are batched and numerically hardened for kappa -> 0 (uniform)
and large kappa (exp-normalized forms throughout, safe in float32 up to
kappa ~ 1e4).
"""
from __future__ import annotations

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.math import Frame, dot, normalize, safe_sqrt
from mitsuba_path_guiding_tpu.core.warp import INV_FOURPI

KAPPA_MAX = 1e4
KAPPA_MIN = 1e-3


def vmf_pdf(d: jnp.ndarray, mu: jnp.ndarray, kappa: jnp.ndarray) -> jnp.ndarray:
    """pdf(d) = kappa / (2 pi (1 - e^{-2 kappa})) * e^{kappa (d.mu - 1)}.

    Exp-normalized so it never overflows (vmf.h eval uses the same trick).
    Smoothly degrades to the uniform sphere pdf as kappa -> 0.
    """
    t = dot(d, mu)
    k = jnp.clip(kappa, 0.0, KAPPA_MAX)
    # expm1 form: kappa / (2 pi (1 - exp(-2k))) -> 1/(4 pi) as k -> 0
    denom = 2.0 * jnp.pi * -jnp.expm1(-2.0 * k)
    norm = jnp.where(k > 1e-6, k / jnp.maximum(denom, 1e-30), INV_FOURPI)
    return norm * jnp.exp(k * (jnp.clip(t, -1.0, 1.0) - 1.0))


def vmf_sample(u: jnp.ndarray, mu: jnp.ndarray, kappa: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF sampling (Jakob's numerically stable form, vmf.cpp sample).

    w = 1 + log(u + (1-u) e^{-2 kappa}) / kappa, uniform in phi.
    """
    k = jnp.clip(kappa, 0.0, KAPPA_MAX)
    u0 = jnp.clip(u[..., 0], 1e-7, 1.0 - 1e-7)
    safe_k = jnp.maximum(k, KAPPA_MIN)
    w = 1.0 + jnp.log(u0 + (1.0 - u0) * jnp.exp(-2.0 * safe_k)) / safe_k
    # kappa ~ 0: uniform sphere
    w = jnp.where(k > KAPPA_MIN, w, 1.0 - 2.0 * u0)
    w = jnp.clip(w, -1.0, 1.0)
    r = safe_sqrt(1.0 - w * w)
    phi = 2.0 * jnp.pi * u[..., 1]
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), w], axis=-1)
    return Frame.from_normal(mu).to_world(local)


def mean_cosine_to_kappa(r: jnp.ndarray) -> jnp.ndarray:
    """Banerjee et al. approximation kappa ~= r(3 - r^2)/(1 - r^2).

    Used by weighted-EM fitting (vmf.h setKappa / the parallax-aware paper's
    robust fitting step).  Clamped to [0, KAPPA_MAX].
    """
    r = jnp.clip(r, 0.0, 0.9999)
    kappa = r * (3.0 - r * r) / jnp.maximum(1.0 - r * r, 1e-6)
    return jnp.clip(kappa, 0.0, KAPPA_MAX)


def kappa_to_mean_cosine(kappa: jnp.ndarray) -> jnp.ndarray:
    """coth(kappa) - 1/kappa, the vMF mean resultant length."""
    k = jnp.maximum(kappa, 1e-4)
    return jnp.where(
        kappa > 1e-3,
        1.0 / jnp.tanh(k) - 1.0 / k,
        kappa / 3.0,  # series for small kappa
    )


def vmf_fit_from_moments(weighted_dir_sum: jnp.ndarray, weight_sum: jnp.ndarray):
    """(mu, kappa) from sufficient statistics sum(w_i d_i), sum(w_i).

    The statistics are linear, so they psum across devices/hosts — this is
    the distributed-fit primitive (SURVEY.md §2.7 TPU-native equivalent).
    """
    norm = jnp.linalg.norm(weighted_dir_sum, axis=-1)
    r = norm / jnp.maximum(weight_sum, 1e-12)
    mu = weighted_dir_sum / jnp.maximum(norm, 1e-12)[..., None]
    # degenerate cell: point mu at +z with kappa 0 (uniform)
    bad = (weight_sum <= 1e-12) | (norm <= 1e-12)
    mu = jnp.where(bad[..., None], jnp.array([0.0, 0.0, 1.0]), mu)
    kappa = jnp.where(bad, 0.0, mean_cosine_to_kappa(r))
    return normalize(mu), kappa


def vmf_product_kappa_mu(mu_a, kappa_a, mu_b, kappa_b):
    """Unnormalized product of two vMFs is a vMF: kappa* mu* = ka mu_a + kb mu_b."""
    v = kappa_a[..., None] * mu_a + kappa_b[..., None] * mu_b
    kappa = jnp.linalg.norm(v, axis=-1)
    mu = v / jnp.maximum(kappa, 1e-12)[..., None]
    return mu, kappa
