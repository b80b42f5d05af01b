"""Phase functions: isotropic, Henyey-Greenstein, Rayleigh, Kajiya-Kay,
microflake, and weighted mixtures of the classic families.

Counterpart of /root/reference/src/phase/{isotropic,hg,rayleigh,kkay,
microflake,mixturephase}.cpp (base class include/mitsuba/render/phase.h:117).
Convention matches the reference:
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
    HG = 0          # hg.cpp (g == 0 degenerates to isotropic.cpp)
    RAYLEIGH = 1    # rayleigh.cpp
    KKAY = 2        # kkay.cpp — Kajiya-Kay fiber phase (uniform sampling)
    MICROFLAKE = 3  # microflake.cpp — specular flakes, Gaussian fiber
    #                 distribution (microflake_fiber.h); phase-only parity,
    #                 the directional sigma_t coupling is approximated (the
    #                 medium keeps an isotropic extinction)
    MIXTURE = 4     # mixturephase.cpp — normalized weighted combination of
    #                 the classic families (HG/isotropic/Rayleigh); component
    #                 pick by CDF inversion, pdf = balance-heuristic sum


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


# ---------------------------------------------------------------------------
# Kajiya-Kay (reference src/phase/kkay.cpp): fiber phase with a diffuse
# floor and a cos^e specular cone about the mirrored polar angle; sampled
# uniformly over the sphere exactly like the reference.
# ---------------------------------------------------------------------------

def kkay_normalization(exponent: float) -> float:
    """1 / (2 pi * int_0^pi sin^(e+1) theta dtheta) — the perpendicular-
    illumination normalization the reference computes by Simpson quadrature
    (kkay.cpp configure), here in closed form via the Wallis integral."""
    import math

    e = float(exponent)
    integral = math.sqrt(math.pi) * math.gamma(e / 2 + 1.0) / math.gamma(e / 2 + 1.5)
    return 1.0 / (2.0 * math.pi * integral)


def kkay_eval(wi, wo, axis, aux):
    """aux = (ks, kd, exponent, normalization); axis = fiber orientation.
    ``wi`` toward the previous vertex (kkay.cpp eval)."""
    ks, kd, e, norm = aux[0], aux[1], aux[2], aux[3]
    frame = Frame.from_normal(jnp.broadcast_to(axis, wo.shape))
    rl = frame.to_local(wo)
    z = -dot(wi, jnp.broadcast_to(axis, wi.shape))
    a = jnp.sqrt(
        jnp.maximum(1.0 - z * z, 0.0)
        / jnp.maximum(rl[..., 0] ** 2 + rl[..., 1] ** 2, 1e-12)
    )
    R = frame.to_world(jnp.stack([rl[..., 0] * a, rl[..., 1] * a, z], axis=-1))
    spec = jnp.maximum(dot(R, wo), 0.0) ** e
    return spec * norm * ks + kd * INV_FOURPI


def kkay_sample(wi, axis, aux, u):
    """Uniform-sphere proposal with weight eval*4pi (kkay.cpp sample);
    returns (wo, pdf=1/4pi, weight)."""
    wo = square_to_uniform_sphere(u)
    val = kkay_eval(wi, wo, axis, aux)
    return wo, jnp.full(wo.shape[:-1], INV_FOURPI), val * (4.0 * jnp.pi)


# ---------------------------------------------------------------------------
# Microflake fiber phase (reference src/phase/microflake.cpp +
# microflake_fiber.h GaussianFiberDistribution): specular flakes whose
# normals follow D(m) ∝ exp(-cos^2 theta_m / (2 sigma^2)) about the fiber.
# eval = 0.5 D(h) / sigma_t(cos theta_wi); the sampler draws flake normals
# by exact truncated-Gaussian inversion (erfinv replaces the reference's
# Brent solve) and accepts with |wi.m| — K fixed vectorized rounds instead
# of the reference's unbounded rejection loop (TPU-friendly control flow).
# ---------------------------------------------------------------------------

_MF_K = 16  # vectorized rejection rounds; failure mass < (1 - E|wi.m|)^K


def microflake_tables(stddev: float, n: int = 64):
    """Host-side numeric sigma_t table (microflake_fiber.h precomputes a
    polynomial expansion; a direct quadrature table is simpler and exact):
    sigma_t(cos theta_w) = int_sphere |w.m| D(m) dm over n values of
    cos theta_w in [0, 1].  Returns (aux (4,), table (n,)) float32."""
    import math

    import numpy as np

    s = float(stddev)
    norm = 1.0 / ((2.0 * math.pi) ** 1.5 * s * math.erf(1.0 / (math.sqrt(2.0) * s)))
    # quadrature grid over the flake normal sphere
    nt, np_ = 256, 64
    ct_m = np.linspace(-1.0, 1.0, nt)  # cos theta_m
    phi = np.linspace(0.0, 2.0 * np.pi, np_, endpoint=False)
    st_m = np.sqrt(np.maximum(1.0 - ct_m**2, 0.0))
    D = np.exp(-(ct_m**2) / (2 * s * s)) * norm  # (nt,)
    ct_w = np.linspace(0.0, 1.0, n)
    st_w = np.sqrt(np.maximum(1.0 - ct_w**2, 0.0))
    # |w.m| = |ct_w ct_m + st_w st_m cos(phi)|
    dots = np.abs(
        ct_w[:, None, None] * ct_m[None, :, None]
        + st_w[:, None, None] * st_m[None, :, None] * np.cos(phi)[None, None, :]
    )
    sig = (dots.mean(-1) * D[None, :]).sum(-1) * (2.0 / nt) * (2.0 * np.pi)
    aux = np.array(
        [s, norm, math.erf(1.0 / (math.sqrt(2.0) * s)), float(sig.mean())],
        dtype=np.float32,
    )  # aux[3] = direction-averaged sigma (normalizer for the directional
    #   extinction coupling in integrators/volpath.py)
    return aux, sig.astype(np.float32)


def _mf_sigma_t(table, cos_w):
    n = table.shape[0]
    x = jnp.abs(cos_w) * (n - 1)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 2)
    f = x - i0
    return table[i0] * (1.0 - f) + table[i0 + 1] * f


def microflake_eval(wi, wo, axis, aux, table):
    s, norm = aux[0], aux[1]
    frame = Frame.from_normal(jnp.broadcast_to(axis, wo.shape))
    wi_l = frame.to_local(wi)
    wo_l = frame.to_local(wo)
    h = wi_l + wo_l
    hl = jnp.linalg.norm(h, axis=-1)
    ct_h = jnp.where(hl > 1e-9, h[..., 2] / jnp.maximum(hl, 1e-9), 0.0)
    D = jnp.exp(-ct_h * ct_h / (2.0 * s * s)) * norm
    sig = _mf_sigma_t(table, wi_l[..., 2])
    val = 0.5 * D / jnp.maximum(sig, 1e-9)
    return jnp.where(hl > 1e-9, val, 0.0)


def microflake_sample(wi, axis, aux, table, u):
    """K-round vectorized flake rejection; returns (wo, pdf=eval, weight~1).
    Lanes where all K rounds reject keep weight 0 (the reference returns 0
    after its iteration cap too)."""
    s, c1 = aux[0], aux[2]
    frame = Frame.from_normal(jnp.broadcast_to(axis, wi.shape))
    wi_l = frame.to_local(wi)
    # independent per-round streams derived by hashing the two uniforms
    # into counter-based keys (correlated Cranley-Patterson rotations bias
    # the acceptance test against the proposal — chi2-detectable)
    import jax

    bits = (u * jnp.float32(1 << 23)).astype(jnp.uint32)
    seed = (bits[..., 0] ^ (bits[..., 1] << jnp.uint32(9))).astype(jnp.uint32)
    r = jax.vmap(
        lambda s: jax.random.uniform(jax.random.PRNGKey(s), (_MF_K, 3))
    )(seed.reshape(-1)).reshape(u.shape[:-1] + (_MF_K, 3))
    u1, u2, u3 = r[..., 0], r[..., 1], r[..., 2]
    # exact truncated-Gaussian inversion of the flake polar angle
    from jax.scipy.special import erfinv

    ct = jnp.sqrt(2.0) * s * erfinv(jnp.clip((2.0 * u1 - 1.0) * c1, -1.0 + 1e-7, 1.0 - 1e-7))
    ct = jnp.clip(ct, -1.0, 1.0)
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    ph = 2.0 * jnp.pi * u2
    m = jnp.stack([st * jnp.cos(ph), st * jnp.sin(ph), ct], axis=-1)  # (..., K, 3)
    dp = jnp.sum(wi_l[..., None, :] * m, axis=-1)
    accept = u3 < jnp.abs(dp)
    # first accepted round (argmax of the boolean sequence)
    idx = jnp.argmax(accept, axis=-1)
    any_ok = jnp.any(accept, axis=-1)
    m_sel = jnp.take_along_axis(m, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    dp_sel = jnp.take_along_axis(dp, idx[..., None], axis=-1)[..., 0]
    wo_l = 2.0 * dp_sel[..., None] * m_sel - wi_l
    wo = frame.to_world(wo_l)
    pdf = microflake_eval(wi, wo, axis, aux, table)
    w = jnp.where(any_ok, 1.0, 0.0)
    return wo, jnp.where(any_ok, pdf, 0.0), w


# ---------------------------------------------------------------------------
# Mixture phase (reference src/phase/mixturephase.cpp): normalized weighted
# sum of component phases.  The reference nests arbitrary PhaseFunction
# children; here components are the classic perfectly-importance-sampled
# families (HG with per-component g, isotropic, Rayleigh), encoded as three
# parallel (K,) arrays so eval/sample stay a single fused broadcast — no
# per-component virtual dispatch.  Because every component has eval == pdf,
# the mixture's eval equals its balance-heuristic pdf and the sample weight
# is exactly 1 (mixturephase.cpp sample's pdf() over all components).
# ---------------------------------------------------------------------------

MIX_HG = 0        # HG component (|g| < 1e-4 degenerates to isotropic)
MIX_RAYLEIGH = 1  # Rayleigh component


def _mix_component_pdf(cos_theta, gs, kinds):
    """Per-component phase values at cos_theta = dot(-wi, wo).

    cos_theta (..., 1) broadcasts against gs/kinds (K,) -> (..., K)."""
    hg = jnp.where(jnp.abs(gs) < 1e-4, INV_FOURPI, hg_pdf(cos_theta, gs))
    ray = 3.0 / (16.0 * jnp.pi) * (1.0 + cos_theta * cos_theta)
    return jnp.where(kinds == MIX_RAYLEIGH, ray, hg)


def mixture_eval(wi, wo, weights, gs, kinds):
    """Weighted phase value = combined pdf (weights pre-normalized to 1)."""
    c = dot(-wi, wo)[..., None]
    return jnp.sum(weights * _mix_component_pdf(c, gs, kinds), axis=-1)


def mixture_sample(wi, u, weights, gs, kinds):
    """Pick a component by CDF inversion on u[...,0], re-stretch the uniform
    inside the selected slab (keeps stratification), invert that component's
    exact cos-CDF, and return (wo, pdf) with pdf the full balance sum —
    mixturephase.cpp sample() + pdf().  Sample weight is 1 by construction."""
    cdf = jnp.cumsum(weights)
    u0 = u[..., 0]
    k = jnp.sum(u0[..., None] >= cdf[:-1], axis=-1).astype(jnp.int32)
    w_k = weights[k]
    lo = cdf[k] - w_k
    u0p = jnp.clip((u0 - lo) / jnp.maximum(w_k, 1e-12), 0.0, 1.0 - 1e-7)
    g_k = jnp.clip(gs[k], -0.999, 0.999)
    # HG inverse CDF (as phase_sample above)
    sqr = (1.0 - g_k * g_k) / (1.0 - g_k + 2.0 * g_k * u0p)
    two_g = jnp.where(jnp.abs(g_k) < 1e-6, 1e-6, 2.0 * g_k)
    cos_hg = jnp.where(
        jnp.abs(g_k) < 1e-4,
        1.0 - 2.0 * u0p,
        jnp.clip((1.0 + g_k * g_k - sqr * sqr) / two_g, -1.0, 1.0),
    )
    # Rayleigh inverse CDF (Cardano, as rayleigh_sample above)
    v = 2.0 * (2.0 * u0p - 1.0)
    z = jnp.cbrt(v + jnp.sqrt(v * v + 1.0))
    cos_ray = jnp.clip(z - 1.0 / z, -1.0, 1.0)
    cos_t = jnp.where(kinds[k] == MIX_RAYLEIGH, cos_ray, cos_hg)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u[..., 1]
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    wo = Frame.from_normal(-wi).to_world(local)
    return wo, mixture_eval(wi, wo, weights, gs, kinds)


def phase_eval_kind(wi, wo, g, kind: int = PhaseKind.HG, med=None):
    """Static-kind dispatch used by the volumetric integrator.  ``wi``
    points toward the previous vertex.  ``med`` supplies the fiber
    orientation + parameters for the KKAY/MICROFLAKE families."""
    if kind == PhaseKind.RAYLEIGH:
        return rayleigh_eval(wi, wo)
    if kind == PhaseKind.KKAY:
        return kkay_eval(wi, wo, med.orientation, med.phase_aux)
    if kind == PhaseKind.MICROFLAKE:
        return microflake_eval(wi, wo, med.orientation, med.phase_aux, med.sigt_table)
    if kind == PhaseKind.MIXTURE:
        return mixture_eval(wi, wo, med.mix_weights, med.mix_g, med.mix_kinds)
    return phase_eval(wi, wo, g)


def phase_sample_kind(wi, g, u, kind: int = PhaseKind.HG, med=None):
    """Returns (wo, pdf).  KKAY/MICROFLAKE are not perfectly importance
    sampled — use phase_sample_kind_w to get the weight as well; this
    wrapper folds the weight into nothing (callers that assume
    weight == 1 should migrate)."""
    wo, pdf, _ = phase_sample_kind_w(wi, g, u, kind, med)
    return wo, pdf


def phase_sample_kind_w(wi, g, u, kind: int = PhaseKind.HG, med=None):
    """(wo, pdf, weight): weight = eval/pdf (1 for the perfectly-sampled
    HG/isotropic/Rayleigh families)."""
    if kind == PhaseKind.RAYLEIGH:
        wo, pdf = rayleigh_sample(wi, u)
        return wo, pdf, jnp.ones_like(pdf)
    if kind == PhaseKind.KKAY:
        return kkay_sample(wi, med.orientation, med.phase_aux, u)
    if kind == PhaseKind.MICROFLAKE:
        return microflake_sample(wi, med.orientation, med.phase_aux, med.sigt_table, u)
    if kind == PhaseKind.MIXTURE:
        wo, pdf = mixture_sample(wi, u, med.mix_weights, med.mix_g, med.mix_kinds)
        return wo, pdf, jnp.ones_like(pdf)
    wo, pdf = phase_sample(wi, g, u)
    return wo, pdf, jnp.ones_like(pdf)
