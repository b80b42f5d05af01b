"""Wavefront BSDF layer: enum-dispatched sample / eval / pdf / albedo.

The reference's 24 BSDF plugins with virtual dispatch
(/root/reference/src/bsdfs/, base class include/mitsuba/render/bsdf.h:215)
become branch-free batched functions over a material parameter table:
every family is evaluated on the whole wavefront and the per-lane result is
selected by material type — the TPU-idiomatic replacement for divergent
virtual calls (SURVEY.md §7 "plugins -> registries of pure functions").

Conventions (matching the reference's BSDF interface):
  - directions in the local shading frame, +z = shading normal,
  - ``wi`` points from the surface toward the previous path vertex,
  - ``eval`` returns f(wi,wo) * |cos_theta(wo)| (reference
    BSDF::eval(ESolidAngle) includes the cosine, bsdf.h:318),
  - ``sample`` returns (wo, weight = f*cos/pdf, pdf, is_delta); for delta
    lobes pdf is a discrete probability and eval/pdf queries return 0,
  - reflective families are two-sided (frame flipped internally);
    dielectric/null respect orientation — the reference wraps materials in
    ``twosided`` adapters; scenes here get that behavior by default.
  - fork parity: ``albedo`` is BSDF::getAlbedo (bsdf.h:361, fork addition)
    available for every material — feeds the denoiser/guiding AOVs.

Each sample() consumes 3 uniforms: u[...,0:2] direction, u[...,2] lobe.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core.math import (
    cos_theta,
    dot,
    fresnel_conductor,
    fresnel_dielectric,
    normalize,
    reflect_local,
    safe_sqrt,
)
from mitsuba_path_guiding_tpu.core.warp import (
    INV_FOURPI,
    INV_PI,
    square_to_cosine_hemisphere,
    square_to_cosine_hemisphere_pdf,
)
from mitsuba_path_guiding_tpu.models.microfacet import (
    ALPHA_MIN,
    ggx_d,
    ggx_g1,
    ggx_g2,
    ggx_sample_vndf,
    ggx_vndf_pdf,
)
from mitsuba_path_guiding_tpu.scene.types import BSDFType, Materials


class BSDFSample(NamedTuple):
    wo: jnp.ndarray        # (N, 3) local frame
    weight: jnp.ndarray    # (N, 3) f * cos / pdf
    pdf: jnp.ndarray       # (N,) solid-angle pdf (1 for delta lobes)
    is_delta: jnp.ndarray  # (N,) bool


class _P(NamedTuple):
    """Per-lane gathered material parameters."""

    type: jnp.ndarray
    refl: jnp.ndarray
    spec: jnp.ndarray
    eta: jnp.ndarray
    k: jnp.ndarray
    alpha: jnp.ndarray
    alpha_v: jnp.ndarray
    sub_a: jnp.ndarray   # int32 nested material row (-1 none)
    sub_b: jnp.ndarray
    weight: jnp.ndarray  # blend factor / mask opacity
    extra: tuple         # 5 x (N,) packed columns 27:32 (cloth geometry);
    #                      dead-code-eliminated by XLA when no family reads it


def gather_params(mats: Materials, mid: jnp.ndarray, tex=None) -> _P:
    """Single packed row gather (see Materials.packed layout) — separate
    field gathers materialize lane-padded (N,3) arrays on TPU.
    ``tex``: optional (rgb (N,3), mask (N,)) reflectance override from the
    texture atlas (reference Texture::eval at the shading point)."""
    from mitsuba_path_guiding_tpu.ops.gather_pallas import gather_rows_t

    row = gather_rows_t(mats.packed, mid)  # (32, N)
    v3 = lambda a: jnp.stack([row[a], row[a + 1], row[a + 2]], axis=-1)
    refl = v3(1)
    if tex is not None:
        t_rgb, t_mask = tex
        refl = jnp.where(t_mask[..., None], t_rgb, refl)
    return _P(
        type=row[0].astype(jnp.int32),
        refl=refl,
        spec=v3(4),
        eta=v3(7),
        k=v3(10),
        alpha=jnp.maximum(row[13], ALPHA_MIN),
        alpha_v=jnp.maximum(row[15], ALPHA_MIN),
        sub_a=row[16].astype(jnp.int32),
        sub_b=row[17].astype(jnp.int32),
        weight=row[18],
        extra=tuple(row[27 + i] for i in range(5)),
    )


def _flip_two_sided(p: _P, wi):
    """Reflective families act two-sided: flip wi into the upper hemisphere.
    Returns (wi_flipped, sign) — wo must be un-flipped with the same sign.
    DIFFTRANS and the MASK pass-through lobe transmit, but flipping is
    still correct for them: the sampled wo is produced in flipped space
    and un-flipped with the same sign, landing on the true opposite side."""
    transmissive = (
        (p.type == BSDFType.DIELECTRIC)
        | (p.type == BSDFType.ROUGH_DIELECTRIC)
        | (p.type == BSDFType.NULL)
        | (p.type == BSDFType.HK)
        | (p.type == BSDFType.THINDIELECTRIC)
    )
    s = jnp.where(transmissive | (cos_theta(wi) >= 0.0), 1.0, -1.0)
    return jnp.stack(
        [wi[..., 0], wi[..., 1], wi[..., 2] * s], axis=-1
    ), s


def _coat_refract(w, eta_ratio):
    """Hemisphere-preserving refraction across the coating interface
    (coating.cpp refractIn/refractOut): tangential component scaled by
    1/eta_ratio, z keeps its sign.  Returns (w_t, R) with R = 1 on TIR."""
    inv = 1.0 / eta_ratio
    cz = w[..., 2]
    st2 = jnp.maximum(0.0, 1.0 - cz * cz) * inv * inv
    tir = st2 >= 1.0
    ct = safe_sqrt(1.0 - st2)
    w_t = jnp.stack([w[..., 0] * inv, w[..., 1] * inv, jnp.sign(cz) * ct], axis=-1)
    R = fresnel_dielectric(jnp.abs(cz), eta_ratio)
    return w_t, jnp.where(tir, jnp.ones_like(R), R)


def _fdr_int(eta):
    """Average internal Fresnel reflectance approximation (reference
    util.cpp fresnelDiffuseReflectance, d'Eon fit) for plastic."""
    return jnp.where(
        eta < 1.0,
        -0.4399 + 0.7099 / eta - 0.3319 / (eta * eta) + 0.0636 / (eta * eta * eta),
        -1.4399 / (eta * eta) + 0.7099 / eta + 0.6681 + 0.0636 * eta,
    )


# ---------------------------------------------------------------------------
# per-family eval (f * |cos_o|) and pdf — smooth lobes only (delta -> 0)
# ---------------------------------------------------------------------------

def _diffuse_eval_pdf(p: _P, wi, wo):
    up = (cos_theta(wi) > 0.0) & (cos_theta(wo) > 0.0)
    f = p.refl * (INV_PI * jnp.maximum(cos_theta(wo), 0.0))[..., None]
    pdf = square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(up[..., None], f, 0.0), jnp.where(up, pdf, 0.0)


def _orennayar_eval_pdf(p: _P, wi, wo):
    up = (cos_theta(wi) > 0.0) & (cos_theta(wo) > 0.0)
    sigma = p.alpha
    s2 = sigma * sigma
    A = 1.0 - s2 / (2.0 * (s2 + 0.33))
    B = 0.45 * s2 / (s2 + 0.09)
    ci, co = cos_theta(wi), cos_theta(wo)
    si = safe_sqrt(1.0 - ci * ci)
    so = safe_sqrt(1.0 - co * co)
    # cos(phi_i - phi_o)
    denom = jnp.maximum(si * so, 1e-7)
    cos_dphi = jnp.clip(
        (wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1]) / denom, -1.0, 1.0
    )
    sin_alpha = jnp.maximum(si, so)
    tan_beta = jnp.minimum(si / jnp.maximum(ci, 1e-7), so / jnp.maximum(co, 1e-7))
    f = p.refl * (
        INV_PI * jnp.maximum(co, 0.0) * (A + B * jnp.maximum(cos_dphi, 0.0) * sin_alpha * tan_beta)
    )[..., None]
    pdf = square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(up[..., None], f, 0.0), jnp.where(up, pdf, 0.0)


def _rough_conductor_eval_pdf(p: _P, wi, wo):
    up = (cos_theta(wi) > 1e-6) & (cos_theta(wo) > 1e-6)
    m = normalize(wi + wo)
    D = ggx_d(m, p.alpha)
    G2 = ggx_g2(wi, wo, p.alpha)
    F = fresnel_conductor(dot(wi, m), p.eta, p.k)
    ci = jnp.maximum(cos_theta(wi), 1e-6)
    f = p.spec * F * (D * G2 / (4.0 * ci))[..., None]
    pdf = ggx_vndf_pdf(wi, m, p.alpha) / jnp.maximum(4.0 * jnp.abs(dot(m, wo)), 1e-8)
    return jnp.where(up[..., None], f, 0.0), jnp.where(up, pdf, 0.0)


def _coat_rough_reflection(p: _P, wi, wo):
    """GGX reflection off a ROUGH coat interface (roughcoating.cpp eval):
    microfacet distribution at the coat's alpha, dielectric Fresnel at
    the half-vector.  Returns (f*cos (N,3), vndf-based pdf (N,))."""
    up = (cos_theta(wi) > 1e-6) & (cos_theta(wo) > 1e-6)
    m = normalize(wi + wo)
    D = ggx_d(m, p.alpha)
    G2 = ggx_g2(wi, wo, p.alpha)
    eta_c = jnp.maximum(p.eta[..., 0], 1e-3)
    F = fresnel_dielectric(dot(wi, m), eta_c)
    ci = jnp.maximum(cos_theta(wi), 1e-6)
    f = p.spec * (F * D * G2 / (4.0 * ci))[..., None]
    pdf = ggx_vndf_pdf(wi, m, p.alpha) / jnp.maximum(
        4.0 * jnp.abs(dot(m, wo)), 1e-8
    )
    return jnp.where(up[..., None], f, 0.0), jnp.where(up, pdf, 0.0)


def _plastic_lobe_probs(p: _P, wi):
    eta = p.eta[..., 0]
    fi = fresnel_dielectric(jnp.abs(cos_theta(wi)), eta)
    # specular sampling probability (reference plastic.cpp uses fresnel +
    # sampling weights); clamp away from 0/1 for stability
    return jnp.clip(fi, 0.05, 0.95), fi


def _plastic_eval_pdf(p: _P, wi, wo):
    """Smooth plastic: delta coat (invisible to eval) + internally-scattered
    diffuse (reference src/bsdfs/plastic.cpp nonlinear=false model)."""
    up = (cos_theta(wi) > 0.0) & (cos_theta(wo) > 0.0)
    eta = p.eta[..., 0]
    fi = fresnel_dielectric(cos_theta(wi), eta)
    fo = fresnel_dielectric(cos_theta(wo), eta)
    fdr = _fdr_int(eta)
    inv_eta2 = 1.0 / (eta * eta)
    denom = 1.0 - p.refl * fdr[..., None]
    f = (
        p.refl
        / jnp.maximum(denom, 1e-3)
        * (INV_PI * jnp.maximum(cos_theta(wo), 0.0) * (1.0 - fi) * (1.0 - fo) * inv_eta2)[..., None]
    )
    spec_prob, _ = _plastic_lobe_probs(p, wi)
    pdf = (1.0 - spec_prob) * square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(up[..., None], f, 0.0), jnp.where(up, pdf, 0.0)


def _rough_plastic_eval_pdf(p: _P, wi, wo):
    up = (cos_theta(wi) > 1e-6) & (cos_theta(wo) > 1e-6)
    eta = p.eta[..., 0]
    m = normalize(wi + wo)
    D = ggx_d(m, p.alpha)
    G2 = ggx_g2(wi, wo, p.alpha)
    Fm = fresnel_dielectric(dot(wi, m), eta)
    ci = jnp.maximum(cos_theta(wi), 1e-6)
    f_spec = p.spec * (Fm * D * G2 / (4.0 * ci))[..., None]
    fi = fresnel_dielectric(cos_theta(wi), eta)
    fo = fresnel_dielectric(cos_theta(wo), eta)
    fdr = _fdr_int(eta)
    inv_eta2 = 1.0 / (eta * eta)
    f_diff = (
        p.refl
        / jnp.maximum(1.0 - p.refl * fdr[..., None], 1e-3)
        * (INV_PI * jnp.maximum(cos_theta(wo), 0.0) * (1.0 - fi) * (1.0 - fo) * inv_eta2)[..., None]
    )
    spec_prob, _ = _plastic_lobe_probs(p, wi)
    pdf_spec = ggx_vndf_pdf(wi, m, p.alpha) / jnp.maximum(4.0 * jnp.abs(dot(m, wo)), 1e-8)
    pdf = spec_prob * pdf_spec + (1.0 - spec_prob) * square_to_cosine_hemisphere_pdf(wo)
    f = f_spec + f_diff
    return jnp.where(up[..., None], f, 0.0), jnp.where(up, pdf, 0.0)


def _phong_exponent(p: _P):
    # alpha (roughness) -> Phong exponent, standard conversion
    return jnp.clip(2.0 / jnp.maximum(p.alpha * p.alpha, 1e-6) - 2.0, 1.0, 1e5)


def _phong_lobe_probs(p: _P):
    ks = jnp.mean(p.spec, axis=-1)
    kd = jnp.mean(p.refl, axis=-1)
    return jnp.clip(ks / jnp.maximum(ks + kd, 1e-9), 0.05, 0.95)


def _phong_eval_pdf(p: _P, wi, wo):
    """Modified Phong (reference src/bsdfs/phong.cpp)."""
    up = (cos_theta(wi) > 0.0) & (cos_theta(wo) > 0.0)
    n = _phong_exponent(p)
    r = reflect_local(wi)
    cos_r = jnp.maximum(dot(r, wo), 0.0)
    co = jnp.maximum(cos_theta(wo), 0.0)
    f = (
        p.refl * (INV_PI * co)[..., None]
        + p.spec * ((n + 2.0) / (2.0 * jnp.pi) * cos_r**n * co)[..., None]
    )
    spec_prob = _phong_lobe_probs(p)
    pdf_spec = (n + 1.0) / (2.0 * jnp.pi) * cos_r**n
    pdf = spec_prob * pdf_spec + (1.0 - spec_prob) * square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(up[..., None], f, 0.0), jnp.where(up, pdf, 0.0)


def _rough_dielectric_eval_pdf(p: _P, wi, wo):
    """GGX rough glass, Walter et al. 2007 (reference roughdielectric.cpp).

    Everything is computed in 'flipped' space where wi lies in the upper
    hemisphere (s = sign(cos_i)); the microfacet normal m is kept upper.
    Relative IOR eta_rel = eta when entering (cos_i > 0), 1/eta inside.
    Lobe-pick probability is exactly the microfacet Fresnel F(wi.m) — the
    same quantity the sampler uses, so sample/pdf agree including TIR
    (F = 1 -> transmission mass 0).
    """
    eta = p.eta[..., 0]
    ci = cos_theta(wi)
    s = jnp.where(ci >= 0.0, 1.0, -1.0)
    wi_f = jnp.stack([wi[..., 0], wi[..., 1], wi[..., 2] * s], axis=-1)
    wo_f = jnp.stack([wo[..., 0], wo[..., 1], wo[..., 2] * s], axis=-1)
    eta_rel = jnp.where(ci >= 0.0, eta, 1.0 / eta)
    reflect_side = cos_theta(wo_f) > 0.0

    # half vectors (flipped space, forced upper hemisphere)
    m_r = normalize(wi_f + wo_f)
    m_t = normalize(wi_f + eta_rel[..., None] * wo_f)
    m_t = m_t * jnp.sign(cos_theta(m_t) + 1e-20)[..., None]
    m = jnp.where(reflect_side[..., None], m_r, m_t)

    wim = dot(wi_f, m)
    wom = dot(wo_f, m)
    F = fresnel_dielectric(wim, eta_rel)
    D = ggx_d(m, p.alpha)
    G = ggx_g2(wi_f, wo_f, p.alpha)
    aci = jnp.maximum(jnp.abs(ci), 1e-6)
    pdf_m = ggx_vndf_pdf(wi_f, m, p.alpha)

    # reflection: f*cos = F D G / (4 |ci|); pdf = F * pdf_m / (4 |wo.m|)
    f_r = F * D * G / (4.0 * aci)
    pdf_r = F * pdf_m / jnp.maximum(4.0 * jnp.abs(wom), 1e-8)
    valid_r = reflect_side & (wim > 1e-6) & (wom > 1e-6)

    # transmission (Walter eq. 21 x cos, radiance transport /eta_rel^2):
    # f*cos = |wim||wom| (1-F) D G / (|ci| (wim + eta_rel wom)^2)
    denom_t = wim + eta_rel * wom
    jac_t = eta_rel * eta_rel * jnp.abs(wom) / jnp.maximum(denom_t * denom_t, 1e-10)
    f_t = jnp.abs(wim) * jnp.abs(wom) * (1.0 - F) * D * G / (
        aci * jnp.maximum(denom_t * denom_t, 1e-10)
    )
    pdf_t = (1.0 - F) * pdf_m * jac_t
    valid_t = (~reflect_side) & (wim > 1e-6) & (wom < -1e-6)

    f = jnp.where(valid_r, f_r, jnp.where(valid_t, f_t, 0.0))
    pdf = jnp.where(valid_r, pdf_r, jnp.where(valid_t, pdf_t, 0.0))
    return p.spec * f[..., None], pdf


def _ward_C(p: _P, m):
    """Anisotropic exponent C(phi_h) * tan^2(theta_h) for half vector m."""
    c2 = cos_theta(m) ** 2
    # tan^2 * cos^2(phi) = mx^2 / mz^2 etc.
    return (m[..., 0] ** 2 / (p.alpha * p.alpha) + m[..., 1] ** 2 / (p.alpha_v * p.alpha_v)) / jnp.maximum(c2, 1e-8)


def _ward_h_pdf(p: _P, m):
    """Half-vector pdf of the Ward sampler: exp(-tan2 C)/(pi au av cos^3)."""
    c = jnp.maximum(cos_theta(m), 1e-6)
    return jnp.exp(-_ward_C(p, m)) / (jnp.pi * p.alpha * p.alpha_v * c * c * c)


def _ward_lobe_probs(p: _P):
    ks = jnp.mean(p.spec, axis=-1)
    kd = jnp.mean(p.refl, axis=-1)
    return jnp.clip(ks / jnp.maximum(ks + kd, 1e-9), 0.05, 0.95)


def _ward_eval_pdf(p: _P, wi, wo):
    """Anisotropic Ward-Duer (reference src/bsdfs/ward.cpp; Walter 2005
    'Notes on the Ward BRDF' for the sampling density)."""
    ci, co = cos_theta(wi), cos_theta(wo)
    up = (ci > 1e-6) & (co > 1e-6)
    m = normalize(wi + wo)
    expo = jnp.exp(-_ward_C(p, m))
    f_spec = p.spec * (
        expo / jnp.maximum(4.0 * jnp.pi * p.alpha * p.alpha_v * jnp.sqrt(jnp.maximum(ci * co, 1e-8)), 1e-8) * co
    )[..., None]
    f = p.refl * (INV_PI * jnp.maximum(co, 0.0))[..., None] + f_spec
    sp = _ward_lobe_probs(p)
    pdf_spec = _ward_h_pdf(p, m) / jnp.maximum(4.0 * jnp.abs(dot(m, wo)), 1e-8)
    pdf = sp * pdf_spec + (1.0 - sp) * square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(up[..., None], f, 0.0), jnp.where(up, pdf, 0.0)


def _difftrans_eval_pdf(p: _P, wi, wo):
    """Diffuse transmission (reference src/bsdfs/difftrans.cpp): wo in the
    hemisphere opposite wi (flipped space: wi up, wo down)."""
    thru = (cos_theta(wi) > 0.0) & (cos_theta(wo) < 0.0)
    aco = jnp.abs(cos_theta(wo))
    f = p.refl * (INV_PI * aco)[..., None]
    pdf = aco * INV_PI
    return jnp.where(thru[..., None], f, 0.0), jnp.where(thru, pdf, 0.0)


# ---------------------------------------------------------------------------
# woven cloth (Irawan-Marschner) — reference src/bsdfs/irawan.cpp
# ---------------------------------------------------------------------------
# The reference evaluates the published filament/staple yarn-segment
# integrands per query (irawan.cpp evalFilamentIntegrand :393-468,
# evalStapleIntegrand :470-540).  Here the same model equations run
# vectorized on the wavefront: the weave tile is baked at build time into a
# yarn-record texture (models/cloth.py compile_cloth: warp/weft bit + spine
# parameter u + cross-section parameter v + per-yarn ks scale, one nearest
# fetch), the per-material geometry scalars ride repurposed packed columns
# (scene/types.py CLOTH), and the integrand below is written once with an
# ``xp`` namespace so the build-time MC normalization (host NumPy) uses the
# IDENTICAL math as the jit eval.  Sampling is cosine-hemisphere exactly
# like the reference (irawan.cpp:339-373), so pdf consistency for MIS is
# trivial.  Validity guards (ss in [0,1), w*sin(umax) < l, kappa >= -1,
# irawan.cpp:396-406) are enforced at build time, not per lane.


def _cloth_smoothstep(x, xp):
    x = xp.clip(x, 0.0, 1.0)
    return x * x * (3.0 - 2.0 * x)


def _cloth_von_mises(cos_x, b, xp):
    """exp(b cos x) / (2 pi I0(b)), Abramowitz-Stegun polynomial I0."""
    ab = xp.abs(b)
    t_s = (ab / 3.75) ** 2
    i0_s = 1.0 + t_s * (3.5156229 + t_s * (3.0899424 + t_s * (1.2067492
           + t_s * (0.2659732 + t_s * (0.0360768 + t_s * 0.0045813)))))
    t_l = 3.75 / xp.maximum(ab, 1e-9)
    i0_l = xp.exp(ab) / xp.sqrt(xp.maximum(ab, 1e-9)) * (
        0.39894228 + t_l * (0.01328592 + t_l * (0.00225319 + t_l * (
            -0.00157565 + t_l * (0.00916281 + t_l * (-0.02057706 + t_l * (
                0.02635537 + t_l * (-0.01647633 + t_l * 0.00392377)))))))
    )
    i0 = xp.where(ab <= 3.75, i0_s, i0_l)
    return xp.exp(b * cos_x) / (2.0 * jnp.pi * i0)


def _cloth_seeliger(c1, c2, xp):
    c1 = xp.maximum(c1, 0.0)
    c2 = xp.maximum(c2, 0.0)
    return xp.where(
        (c1 > 0) & (c2 > 0),
        c1 * c2 / (4.0 * jnp.pi * xp.maximum(c1 + c2, 1e-12)),
        xp.zeros_like(c1),
    )


def _cloth_radius(u, umax, kappa, w, l, xp):
    """Yarn-spine radius of curvature: ellipse / hyperbola / parabola /
    cylinder by the sign of rhat (Irawan thesis 5.3; irawan.cpp
    radiusOfCurvature).  All branches computed with clamped inputs so the
    untaken ones stay NaN-free (the renderer is jax.grad-able)."""
    a = 0.5 * w
    tan_umax = xp.tan(umax)
    rhat = 1.0 + kappa * (1.0 + 1.0 / xp.maximum(tan_umax, 1e-9))
    rim = 0.5 * l - a * xp.sin(umax)  # > 0 by the build-time validity check
    # elliptic (rhat > 0)
    rh_e = xp.maximum(rhat, 1e-6)
    tmax_e = xp.arctan(rh_e * tan_umax)
    bhat_e = rim / xp.maximum(xp.sin(tmax_e), 1e-9)
    ahat_e = bhat_e / rh_e
    t_e = xp.arctan(rh_e * xp.tan(u))
    R_e = (bhat_e ** 2 * xp.cos(t_e) ** 2
           + ahat_e ** 2 * xp.sin(t_e) ** 2) ** 1.5 / xp.maximum(
        ahat_e * bhat_e, 1e-12)
    # hyperbolic (rhat < 0)
    rh_h = xp.minimum(rhat, -1e-6)
    tmax_h = -xp.arctanh(xp.clip(rh_h * tan_umax, -0.999999, 0.999999))
    sh = xp.sinh(tmax_h)
    bhat_h = rim / xp.where(xp.abs(sh) < 1e-9, 1e-9, sh)
    ahat_h = bhat_h / rh_h
    t_h = -xp.arctanh(xp.clip(rh_h * xp.tan(u), -0.999999, 0.999999))
    den_h = ahat_h * bhat_h
    R_h = -(bhat_h ** 2 * xp.cosh(t_h) ** 2
            + ahat_h ** 2 * xp.sinh(t_h) ** 2) ** 1.5 / xp.where(
        xp.abs(den_h) < 1e-12, -1e-12, den_h)
    # parabolic (rhat == 0)
    ahat_p = rim / xp.maximum(2.0 * tan_umax, 1e-9)
    R_p = 2.0 * ahat_p * (1.0 + xp.tan(u) ** 2) ** 1.5
    # straight spine (rhat == 1): constant R
    R_c = rim / xp.maximum(xp.sin(umax), 1e-9) + xp.zeros_like(u)
    return xp.where(
        xp.abs(rhat - 1.0) < 1e-9, R_c,
        xp.where(rhat > 0.0, R_e, xp.where(rhat < 0.0, R_h, R_p)),
    )


def _cloth_filament(u, v, oi, orr, alpha, beta, ss, umax, kappa, w, l,
                    h_width, xp):
    """Filament-yarn (psi = 0) specular integrand with the per-point
    highlight-band gate |y(u(v)) - y(u)| < delta_y/2
    (irawan.cpp evalFilamentIntegrand :455-465)."""
    hs = oi + orr
    sum_len = xp.sqrt(xp.maximum(xp.sum(hs * hs, axis=-1), 1e-18))
    h = hs / sum_len[..., None]
    u_of_v = xp.arctan2(h[..., 1], xp.maximum(h[..., 2], 1e-12))
    in_range = xp.abs(u_of_v) < umax
    # n at the reflection locus (u_of_v, v)
    nx = xp.sin(v)
    ny = xp.sin(u_of_v) * xp.cos(v)
    nz = xp.cos(u_of_v) * xp.cos(v)
    nl = xp.sqrt(xp.maximum(nx * nx + ny * ny + nz * nz, 1e-18))
    n_i = (nx * oi[..., 0] + ny * oi[..., 1] + nz * oi[..., 2]) / nl
    n_r = (nx * orr[..., 0] + ny * orr[..., 1] + nz * orr[..., 2]) / nl
    a = 0.5 * w
    R = _cloth_radius(
        xp.minimum(xp.abs(u_of_v), (1.0 - ss) * umax),
        (1.0 - ss) * umax, kappa, w, l, xp)
    # t = (0, cos u_of_v, -sin u_of_v); (t x h)_x = cos(u)*h_z + sin(u)*h_y
    tchx = xp.cos(u_of_v) * h[..., 2] + xp.sin(u_of_v) * h[..., 1]
    Gu = a * (R + a * xp.cos(v)) / xp.maximum(sum_len * xp.abs(tchx), 1e-12)
    fc = alpha + _cloth_von_mises(-xp.sum(oi * orr, axis=-1), beta, xp)
    A = _cloth_seeliger(n_i, n_r, xp)
    ss_fac = 1.0 - _cloth_smoothstep(
        (xp.abs(u_of_v) - (1.0 - ss) * umax) / xp.maximum(ss * umax, 1e-9),
        xp)
    A = xp.where(ss > 0.0, A * ss_fac, A)
    fs = Gu * fc * A * jnp.pi * l
    delta_y = l * h_width
    y_scale = 0.5 * l / xp.maximum(umax, 1e-6)
    y_of_v = xp.clip(u_of_v * y_scale, 0.5 * (delta_y - l),
                     0.5 * (l - delta_y))
    on_band = xp.abs(y_of_v - u * y_scale) < 0.5 * delta_y
    return xp.where(in_range & on_band, fs / delta_y, xp.zeros_like(fs))


def _cloth_staple(u, v, oi, orr, alpha, beta, psi, umax, kappa, w, l,
                  h_width, xp):
    """Staple-yarn (psi != 0) integrand: the reflection locus is v(u)
    (irawan.cpp evalStapleIntegrand)."""
    hs = oi + orr
    sum_len = xp.sqrt(xp.maximum(xp.sum(hs * hs, axis=-1), 1e-18))
    h = hs / sum_len[..., None]
    hx, hy, hz = h[..., 0], h[..., 1], h[..., 2]
    D = (hy * xp.cos(u) - hz * xp.sin(u)) / (
        xp.sqrt(xp.maximum(
            hx ** 2 + (hy * xp.sin(u) + hz * xp.cos(u)) ** 2, 1e-18))
        * xp.where(xp.abs(xp.tan(psi)) < 1e-6, 1e-6, xp.tan(psi)))
    v_of_u = xp.arctan2(-hy * xp.sin(u) - hz * xp.cos(u), hx) \
        + xp.arccos(xp.clip(D, -1.0, 1.0))
    in_range = (xp.abs(D) < 1.0) & (xp.abs(v_of_u) < jnp.pi / 2.0)
    nx = xp.sin(v_of_u)
    ny = xp.sin(u) * xp.cos(v_of_u)
    nz = xp.cos(u) * xp.cos(v_of_u)
    nl = xp.sqrt(xp.maximum(nx * nx + ny * ny + nz * nz, 1e-18))
    n_i = (nx * oi[..., 0] + ny * oi[..., 1] + nz * oi[..., 2]) / nl
    n_r = (nx * orr[..., 0] + ny * orr[..., 1] + nz * orr[..., 2]) / nl
    n_h = (nx * hx + ny * hy + nz * hz) / nl
    a = 0.5 * w
    R = _cloth_radius(xp.abs(u), umax, kappa, w, l, xp)
    Gv = a * (R + a * xp.cos(v_of_u)) / xp.maximum(
        sum_len * xp.maximum(n_h, 1e-9) * xp.abs(xp.sin(psi)), 1e-12)
    fc = alpha + _cloth_von_mises(-xp.sum(oi * orr, axis=-1), beta, xp)
    A = _cloth_seeliger(n_i, n_r, xp)
    fs = Gv * fc * A * 2.0 * w * umax
    delta_x = w * h_width
    x_of_u = xp.clip(v_of_u * w / jnp.pi, 0.5 * (delta_x - w),
                     0.5 * (w - delta_x))
    on_band = xp.abs(x_of_u - v * w / jnp.pi) < 0.5 * delta_x
    return xp.where(in_range & on_band, fs / delta_x, xp.zeros_like(fs))


def cloth_spec_raw(wi, wo, weft, u, v, alpha, beta, ss, psi, umax, kappa,
                   w, l, h_width, area_warp, area_weft, xp=jnp):
    """Unnormalized Irawan specular (area-weighted integrand) at a yarn
    record (weft?, u, v) for local directions wi/wo (+z = base shading
    normal).  Weft lanes rotate into the yarn frame exactly like the
    reference's weave-cell lookup (irawan.cpp eval: the pattern entry
    decides warp/weft and the frame quarter-turn); u/v are baked already
    yarn-local (models/cloth.py).  ``xp`` lets the build-time MC
    normalization (NumPy) share this exact code with the jit eval."""
    wfm = weft[..., None]
    oi = xp.where(wfm, xp.stack(
        [-wi[..., 1], wi[..., 0], wi[..., 2]], axis=-1), wi)
    orr = xp.where(wfm, xp.stack(
        [-wo[..., 1], wo[..., 0], wo[..., 2]], axis=-1), wo)
    fil = _cloth_filament(u, v, oi, orr, alpha, beta, ss, umax, kappa,
                          w, l, h_width, xp)
    stp = _cloth_staple(u, v, oi, orr, alpha, beta, psi, umax, kappa,
                        w, l, h_width, xp)
    integ = xp.where(xp.abs(psi) > 1e-7, stp, fil)
    return integ * xp.where(weft, area_weft, area_warp)


def _cloth_scalars(p: _P):
    """Unpack the repurposed CLOTH columns (scene/types.py)."""
    return dict(
        vm_alpha=p.eta[..., 0], beta=p.eta[..., 1], ss=p.eta[..., 2],
        psi=p.k[..., 0], umax=p.k[..., 1], kappa=p.k[..., 2],
        h_width=p.weight, a_fb=p.alpha, norm=p.alpha_v,
        w=p.extra[0], l=p.extra[1],
        area_warp=p.extra[2], area_weft=p.extra[3], fb_scale=p.extra[4],
    )


def _cloth_eval_pdf(p: _P, wi, wo, aux=None):
    """f*cos and pdf for CLOTH lanes.  With the per-point yarn record
    ``aux`` = (weft bool, u, v, ks_scale) the full band-gated integrand
    runs (pointwise-exact vs the model, tests/test_irawan_oracle.py);
    without it (integrators that do not fetch textures) the spec falls
    back to the round-4 uv-averaged isotropic Ward fit.  Both paths share
    the additive-ks energy normalization, and both sample/pdf as a plain
    cosine hemisphere (irawan.cpp:324-373)."""
    c = _cloth_scalars(p)
    ci, co = cos_theta(wi), cos_theta(wo)
    up = (ci > 1e-6) & (co > 1e-6)
    if aux is not None:
        weft, u_p, v_p, ks_s = aux
        raw = cloth_spec_raw(
            wi, wo, weft, u_p, v_p,
            c["vm_alpha"], c["beta"], c["ss"], c["psi"], c["umax"],
            c["kappa"], c["w"], c["l"], c["h_width"],
            c["area_warp"], c["area_weft"], xp=jnp)
        spec_s = raw * c["norm"] * ks_s
    else:
        # isotropic Ward lobe, energy-matched by the build-time fb_scale
        m = normalize(wi + wo)
        a2 = jnp.maximum(c["a_fb"] * c["a_fb"], 1e-6)
        ct2 = jnp.maximum(m[..., 2] * m[..., 2], 1e-8)
        tan2 = (m[..., 0] ** 2 + m[..., 1] ** 2) / ct2
        ward = jnp.exp(-tan2 / a2) / (
            4.0 * jnp.pi * a2 * jnp.sqrt(jnp.maximum(ci * co, 1e-8)))
        spec_s = ward * c["fb_scale"]
    f = (p.refl * INV_PI + p.spec * spec_s[..., None]) \
        * jnp.maximum(co, 0.0)[..., None]
    pdf = square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(up[..., None], f, 0.0), jnp.where(up, pdf, 0.0)


# ---------------------------------------------------------------------------
# dispatch tables
# ---------------------------------------------------------------------------

def _hk_params(p: _P):
    """sigmaS = refl, sigmaA = k, thickness = weight, HG g = eta[...,0]."""
    sigma_s = p.refl
    sigma_t = p.refl + p.k
    tau_d = sigma_t * p.weight[..., None]
    albedo = sigma_s / jnp.maximum(sigma_t, 1e-9)
    g = p.eta[..., 0]
    return tau_d, albedo, g


def _hk_prob_delta(tau_d, cos_i):
    """Mean attenuated transmittance = pick probability of the delta lobe
    (hk.cpp pdf: probSpecularTransmission)."""
    return jnp.mean(
        jnp.exp(-tau_d / jnp.maximum(jnp.abs(cos_i), 1e-6)[..., None]), axis=-1
    )


def _hk_eval_pdf(p: _P, wi, wo):
    """Hanrahan-Krueger single-scattering slab, smooth lobes (hk.cpp eval:
    Hanrahan et al. 93 reflection/transmission terms x |cos_o|; the delta
    transmission lobe is invisible to smooth eval)."""
    from mitsuba_path_guiding_tpu.models.phase import hg_pdf

    tau_d, albedo, g = _hk_params(p)
    ci, co = cos_theta(wi), cos_theta(wo)
    aci, aco = jnp.maximum(jnp.abs(ci), 1e-6), jnp.maximum(jnp.abs(co), 1e-6)
    ph = jnp.where(jnp.abs(g) < 1e-4, INV_FOURPI, hg_pdf(dot(-wi, wo), g))
    # reflection term
    f_r = (
        albedo
        * (ph * ci / jnp.maximum(ci + co, 1e-6))[..., None]
        * (1.0 - jnp.exp((-1.0 / aci - 1.0 / aco)[..., None] * tau_d))
    )
    # transmission term (grazing-equal case folded into the general one
    # with a clamped denominator)
    same = jnp.abs(aci - aco) < 1e-5
    t_gen = (
        (ph * aci)[..., None]
        / jnp.where(same, 1.0, aci - aco)[..., None]
        * (jnp.exp(-tau_d / aci[..., None]) - jnp.exp(-tau_d / aco[..., None]))
    )
    t_same = (ph * 1.0)[..., None] * tau_d / aco[..., None] * jnp.exp(
        -tau_d / aco[..., None]
    )
    f_t = albedo * jnp.where(same[..., None], t_same, t_gen)
    refl = ci * co > 0
    f = jnp.where(refl[..., None], f_r, f_t) * aco[..., None]
    # pdf: phase-function pdf re-weighted by the delta pick probability
    p_delta = _hk_prob_delta(tau_d, ci)
    pdf = ph * (1.0 - p_delta)
    return jnp.maximum(f, 0.0), jnp.maximum(pdf, 0.0)


_SMOOTH_EVALS = {
    BSDFType.HK: _hk_eval_pdf,
    BSDFType.DIFFUSE: _diffuse_eval_pdf,
    BSDFType.ROUGH_DIFFUSE: _orennayar_eval_pdf,
    BSDFType.ROUGH_CONDUCTOR: _rough_conductor_eval_pdf,
    BSDFType.PLASTIC: _plastic_eval_pdf,
    BSDFType.ROUGH_PLASTIC: _rough_plastic_eval_pdf,
    BSDFType.PHONG: _phong_eval_pdf,
    BSDFType.ROUGH_DIELECTRIC: _rough_dielectric_eval_pdf,
    BSDFType.WARD: _ward_eval_pdf,
    BSDFType.DIFFTRANS: _difftrans_eval_pdf,
}

# families allowed as nested lobes of BLEND/MASK (plain, non-nested)
_NESTABLE = tuple(
    t for t in _SMOOTH_EVALS
) + (BSDFType.CONDUCTOR, BSDFType.DIELECTRIC, BSDFType.NULL,
     BSDFType.THINDIELECTRIC)


ALL_TYPES = tuple(range(BSDFType.N_TYPES))


def types_present(mats: Materials):
    """Static tuple of BSDF types used by a (host-concrete) scene — pass to
    sample/eval_pdf so jit compiles only those families."""
    import numpy as np

    return tuple(sorted(set(np.asarray(mats.type).tolist())))


def _eval_smooth(p: _P, wi2, wo2, types):
    """Family-dispatched smooth eval/pdf on already-flipped directions."""
    f = jnp.zeros(wi2.shape)
    pdf = jnp.zeros(wi2.shape[:-1])
    for t, fn in _SMOOTH_EVALS.items():
        if t not in types:
            continue
        ft, pt = fn(p, wi2, wo2)
        sel = p.type == t
        f = jnp.where(sel[..., None], ft, f)
        pdf = jnp.where(sel, pt, pdf)
    return f, pdf


def eval_pdf_raw(mats: Materials, mid, wi, wo, types=ALL_TYPES, tex=None,
                 cloth_aux=None):
    """(f*cos (N,3), pdf (N,)) for the smooth component; 0 for delta mats.

    BLEND rows evaluate both nested lobes and mix by weight
    (blendbsdf.cpp eval/pdf); MASK rows scale the nested lobe by opacity
    (mask.cpp — the (1-opacity) pass-through is a delta lobe, invisible
    to smooth eval).  ``cloth_aux``: per-lane yarn record for CLOTH rows
    (see _cloth_eval_pdf); None falls back to the uv-averaged fit."""
    p = gather_params(mats, mid, tex)
    wi2, s = _flip_two_sided(p, wi)
    wo2 = jnp.stack([wo[..., 0], wo[..., 1], wo[..., 2] * s], axis=-1)
    f, pdf = _eval_smooth(p, wi2, wo2, types)
    if BSDFType.CLOTH in types:
        f_cl, pdf_cl = _cloth_eval_pdf(p, wi2, wo2, cloth_aux)
        is_cl = p.type == BSDFType.CLOTH
        f = jnp.where(is_cl[..., None], f_cl, f)
        pdf = jnp.where(is_cl, pdf_cl, pdf)
    if (BSDFType.BLEND in types) or (BSDFType.MASK in types):
        pa = gather_params(mats, jnp.maximum(p.sub_a, 0), tex)
        fa, pdfa = _eval_smooth(pa, wi2, wo2, types)
        if BSDFType.BLEND in types:
            pb = gather_params(mats, jnp.maximum(p.sub_b, 0), tex)
            fb, pdfb = _eval_smooth(pb, wi2, wo2, types)
            is_b = p.type == BSDFType.BLEND
            w = p.weight
            f = jnp.where(is_b[..., None], (1.0 - w)[..., None] * fa + w[..., None] * fb, f)
            pdf = jnp.where(is_b, (1.0 - w) * pdfa + w * pdfb, pdf)
        if BSDFType.MASK in types:
            is_m = p.type == BSDFType.MASK
            f = jnp.where(is_m[..., None], p.weight[..., None] * fa, f)
            pdf = jnp.where(is_m, p.weight * pdfa, pdf)
    if BSDFType.COATING in types:
        pc = gather_params(mats, jnp.maximum(p.sub_a, 0), tex)
        f_c, pdf_c = _coating_f_pdf(
            p, pc, wi2, wo2, types, tcoat=_gather_coat_trans(mats, mid)
        )
        is_c = p.type == BSDFType.COATING
        f = jnp.where(is_c[..., None], f_c, f)
        pdf = jnp.where(is_c, pdf_c, pdf)
    return f, pdf


def _gather_coat_trans(mats: Materials, mid):
    # (N_COS, N) per-lane rough-coat transmittance table rows, or None
    # when the Materials table has no coat_trans (test fixtures)
    if getattr(mats, "coat_trans", None) is None:
        return None
    from mitsuba_path_guiding_tpu.ops.gather_pallas import gather_rows_t

    return gather_rows_t(mats.coat_trans, mid)


def _interp_coat_trans(tcoat, cos_v):
    # linear interp of the (N_COS, N) table rows at |cos_v| per lane
    n_cos = tcoat.shape[0]
    x = jnp.clip(jnp.abs(cos_v), 0.0, 1.0) * (n_cos - 1)
    i0 = jnp.clip(x.astype(jnp.int32), 0, n_cos - 2)
    t = x - i0
    iota = jax.lax.broadcasted_iota(jnp.int32, tcoat.shape, 0)
    v0 = jnp.sum(jnp.where(iota == i0[None, :], tcoat, 0.0), axis=0)
    v1 = jnp.sum(jnp.where(iota == (i0 + 1)[None, :], tcoat, 0.0), axis=0)
    return v0 * (1.0 - t) + v1 * t


def _coating_f_pdf(p: _P, pc: _P, wi2, wo2, types, tcoat=None):
    """Coating smooth eval/pdf, shared by eval_pdf_raw and _coat_sample.

    Dielectric layer over sub_a (coating.cpp eval/pdf): refract both
    directions into the layer, evaluate the nested lobe there, attenuate
    by the two Fresnel transmittances + Beer absorption, convert the
    measure back out (invEta^2 * cos ratio).  When the coat interface is
    rough (alpha > 0, roughcoating.cpp), its GGX reflection lobe joins
    the smooth eval and the pdf mixes it with probability R12."""
    eta_c = jnp.maximum(p.eta[..., 0], 1e-3)
    wi_in, R12 = _coat_refract(wi2, eta_c)
    wo_in, R21 = _coat_refract(wo2, eta_c)
    f_n, pdf_n = _eval_smooth(pc, wi_in, wo_in, types)
    inv_eta2 = 1.0 / (eta_c * eta_c)
    czo_in = jnp.where(jnp.abs(wo_in[..., 2]) < 1e-6, 1e-6, wo_in[..., 2])
    cos_ratio = wo2[..., 2] / czo_in
    sa = p.refl * p.weight[..., None]  # sigmaA * thickness
    absorb = jnp.exp(
        -sa
        * (
            1.0 / jnp.maximum(jnp.abs(wi_in[..., 2]), 1e-6)
            + 1.0 / jnp.maximum(jnp.abs(wo_in[..., 2]), 1e-6)
        )[..., None]
    )
    # specular sampling weight 0.5 -> probSpecular = R12 (see sample)
    t12, t21 = (1.0 - R12), (1.0 - R21)
    if tcoat is not None:
        # rough interface: microfacet-averaged transmittance from the
        # build-time quadrature table (roughcoating.cpp
        # m_roughTransmittance; the smooth 1-F stand-in is up to ~48%
        # low at grazing for alpha >= 0.2 — measured round 3)
        rough_if = p.alpha > 1e-3
        ti = _interp_coat_trans(tcoat, wi2[..., 2])
        to = _interp_coat_trans(tcoat, wo2[..., 2])
        t12 = jnp.where(rough_if, ti, t12)
        t21 = jnp.where(rough_if, to, t21)
    trans = t12 * t21 * inv_eta2 * cos_ratio
    ok = (R12 < 1.0) & (R21 < 1.0)
    f_c = jnp.where(ok[..., None], f_n * absorb * trans[..., None], 0.0)
    pdf_c = jnp.where(ok, (1.0 - R12) * pdf_n * inv_eta2 * cos_ratio, 0.0)
    # roughcoating.cpp: alpha > 0 turns the coat's delta reflection
    # into a visible GGX lobe (dielectric Fresnel at the half-vector)
    f_r, pdf_r = _coat_rough_reflection(p, wi2, wo2)
    rough_c = p.alpha > 1e-3
    f_c = jnp.where(rough_c[..., None], f_c + f_r, f_c)
    pdf_c = jnp.where(rough_c, pdf_c + R12 * pdf_r, pdf_c)
    return f_c, pdf_c


def _albedo_of(p: _P):
    spec_like = (
        (p.type == BSDFType.CONDUCTOR)
        | (p.type == BSDFType.ROUGH_CONDUCTOR)
    )
    glassy = (
        (p.type == BSDFType.DIELECTRIC)
        | (p.type == BSDFType.ROUGH_DIELECTRIC)
        | (p.type == BSDFType.THINDIELECTRIC)
    )
    a = p.refl
    a = jnp.where(spec_like[..., None], p.spec, a)
    a = jnp.where(glassy[..., None], jnp.ones_like(a), a)
    return a


def albedo_raw(mats: Materials, mid):
    """fork BSDF::getAlbedo parity (bsdf.h:361): approximate reflectance for
    denoiser/guiding feature buffers.  Nested rows mirror the reference's
    recursive getAlbedo (blendbsdf.cpp:135-139 lerp, mask.cpp:113 scale)."""
    p = gather_params(mats, mid)
    a = _albedo_of(p)
    aa = _albedo_of(gather_params(mats, jnp.maximum(p.sub_a, 0)))
    ab = _albedo_of(gather_params(mats, jnp.maximum(p.sub_b, 0)))
    w = p.weight[..., None]
    a = jnp.where((p.type == BSDFType.BLEND)[..., None], (1.0 - w) * aa + w * ab, a)
    a = jnp.where((p.type == BSDFType.MASK)[..., None], w * aa, a)
    # coating: nested albedo (coating.cpp getAlbedo ignores the layer too)
    a = jnp.where((p.type == BSDFType.COATING)[..., None], aa, a)
    return a


def _sample_families(p: _P, wi, u2, ul, types, cloth_aux=None) -> BSDFSample:
    """Sample the plain families on the wavefront, select by type.  ``types``
    is a static tuple of BSDFType values present — absent families compile
    away entirely (the scene builder knows the material set)."""
    T = BSDFType
    has = lambda *ts: any(t in types for t in ts)
    wi2, s = _flip_two_sided(p, wi)
    wo = jnp.zeros_like(wi)
    weight = jnp.zeros_like(wi)
    pdf = jnp.zeros(wi.shape[:-1])
    is_delta = jnp.zeros(wi.shape[:-1], dtype=bool)

    def put(sel, wo_c, w_c, pdf_c, delta_c):
        nonlocal wo, weight, pdf, is_delta
        wo = jnp.where(sel[..., None], wo_c, wo)
        weight = jnp.where(sel[..., None], w_c, weight)
        pdf = jnp.where(sel, pdf_c, pdf)
        is_delta = jnp.where(sel, delta_c, is_delta)

    sel = jnp.zeros(wi.shape[:-1], dtype=bool)
    eta_s = p.eta[..., 0]

    # --- shared pieces, built only for the families that need them
    if has(T.DIFFUSE, T.ROUGH_DIFFUSE, T.PLASTIC, T.ROUGH_PLASTIC, T.PHONG, T.WARD, T.DIFFTRANS, T.CLOTH):
        wo_cos = square_to_cosine_hemisphere(u2)
        pdf_cos = square_to_cosine_hemisphere_pdf(wo_cos)
    if has(T.CONDUCTOR, T.PLASTIC):
        wo_mirror = reflect_local(wi2)

    if has(T.DIFFUSE):
        put(p.type == T.DIFFUSE, wo_cos, p.refl, pdf_cos, jnp.zeros_like(sel))

    if has(T.CLOTH):
        # cosine-hemisphere sampling with weight eval/pdf, exactly the
        # reference strategy (irawan.cpp:357-373)
        f_cl, _ = _cloth_eval_pdf(p, wi2, wo_cos, cloth_aux)
        w_cl = f_cl / jnp.maximum(pdf_cos, 1e-9)[..., None]
        put(p.type == T.CLOTH, wo_cos, w_cl, pdf_cos, jnp.zeros_like(sel))

    if has(T.HK):
        # hk.cpp sample: pick the attenuated delta transmission with its
        # mean transmittance, else draw the internal HG phase direction
        from mitsuba_path_guiding_tpu.models.phase import phase_sample

        tau_d, _, g_hk = _hk_params(p)
        ci_hk = cos_theta(wi2)
        p_delta = _hk_prob_delta(tau_d, ci_hk)
        take_delta = ul < p_delta
        w_delta = jnp.exp(
            -tau_d / jnp.maximum(jnp.abs(ci_hk), 1e-6)[..., None]
        ) / jnp.maximum(p_delta, 1e-9)[..., None]
        wo_ph, _ = phase_sample(wi2, g_hk, u2)
        f_hk, pdf_hk = _hk_eval_pdf(p, wi2, wo_ph)
        w_s = f_hk / jnp.maximum(pdf_hk, 1e-9)[..., None]
        ok_s = pdf_hk > 1e-9
        put(
            p.type == T.HK,
            jnp.where(take_delta[..., None], -wi2, wo_ph),
            jnp.where(take_delta[..., None], w_delta,
                      jnp.where(ok_s[..., None], w_s, 0.0)),
            jnp.where(take_delta, jnp.maximum(p_delta, 1e-9), pdf_hk),
            take_delta,
        )

    if has(T.ROUGH_DIFFUSE):
        f_on, _ = _orennayar_eval_pdf(p, wi2, wo_cos)
        w_on = f_on / jnp.maximum(pdf_cos, 1e-8)[..., None]
        put(p.type == T.ROUGH_DIFFUSE, wo_cos, w_on, pdf_cos, jnp.zeros_like(sel))

    if has(T.DIFFTRANS):
        # cosine lobe on the opposite hemisphere (flipped space: down)
        wo_dt = wo_cos * jnp.asarray([1.0, 1.0, -1.0])
        put(
            p.type == T.DIFFTRANS,
            wo_dt,
            p.refl,
            pdf_cos,
            jnp.zeros_like(sel),
        )

    if has(T.WARD):
        # anisotropic half-vector sampling (Walter 2005 eq. 6-7) mixed
        # with a cosine diffuse lobe
        sp_w = _ward_lobe_probs(p)
        take_spec_w = ul < sp_w
        phi2 = 2.0 * jnp.pi * u2[..., 1]
        hx = p.alpha * jnp.cos(phi2)
        hy = p.alpha_v * jnp.sin(phi2)
        norm = jnp.sqrt(hx * hx + hy * hy)
        cphi = hx / jnp.maximum(norm, 1e-12)
        sphi = hy / jnp.maximum(norm, 1e-12)
        C = cphi * cphi / (p.alpha * p.alpha) + sphi * sphi / (p.alpha_v * p.alpha_v)
        tan2 = -jnp.log(jnp.maximum(u2[..., 0], 1e-9)) / jnp.maximum(C, 1e-12)
        ct = 1.0 / jnp.sqrt(1.0 + tan2)
        st = safe_sqrt(1.0 - ct * ct)
        m_w = jnp.stack([st * cphi, st * sphi, ct], axis=-1)
        wo_w_spec = 2.0 * dot(wi2, m_w)[..., None] * m_w - wi2
        wo_w = jnp.where(take_spec_w[..., None], wo_w_spec, wo_cos)
        f_w, pdf_w = _ward_eval_pdf(p, wi2, wo_w)
        ok_w = (cos_theta(wo_w) > 1e-6) & (pdf_w > 1e-9)
        w_w = f_w / jnp.maximum(pdf_w, 1e-9)[..., None]
        put(
            p.type == T.WARD,
            wo_w,
            jnp.where(ok_w[..., None], w_w, 0.0),
            jnp.where(ok_w, pdf_w, 0.0),
            jnp.zeros_like(sel),
        )

    if has(T.CONDUCTOR):
        F_c = fresnel_conductor(cos_theta(wi2), p.eta, p.k)
        put(
            p.type == T.CONDUCTOR,
            wo_mirror,
            p.spec * F_c,
            jnp.ones_like(pdf),
            jnp.ones_like(sel),
        )

    if has(T.DIELECTRIC):
        # delta reflect/refract — uses signed wi (one-sided physics)
        F_d = fresnel_dielectric(cos_theta(wi), eta_s)
        refl_choice = ul < F_d
        from mitsuba_path_guiding_tpu.core.math import refract_local

        wo_refr, tir = refract_local(wi, eta_s)
        rel_eta = jnp.where(cos_theta(wi) > 0.0, eta_s, 1.0 / eta_s)
        wo_d = jnp.where(refl_choice[..., None], reflect_local(wi), wo_refr)
        w_d = jnp.where(
            refl_choice[..., None],
            p.spec,
            p.spec / jnp.maximum(rel_eta * rel_eta, 1e-8)[..., None],
        )
        pdf_d = jnp.where(refl_choice, F_d, 1.0 - F_d)
        put(p.type == T.DIELECTRIC, wo_d, w_d, pdf_d, jnp.ones_like(sel))

    if has(T.THINDIELECTRIC):
        # zero-thickness slab (reference src/bsdfs/thindielectric.cpp):
        # interior TIR bounces sum to R' = R + T R T (1 + R^2 + ...) =
        # R + T^2 R / (1 - R^2) = 2R/(1+R); transmitted rays exit
        # PARALLEL (no refraction offset).  Both faces see the exterior
        # medium, so the slab is symmetric in the face sign -> |cos|.
        F_t = fresnel_dielectric(jnp.abs(cos_theta(wi)), eta_s)
        Rp = jnp.where(F_t < 1.0, 2.0 * F_t / (1.0 + F_t), jnp.ones_like(F_t))
        refl_t = ul < Rp
        wo_t = jnp.where(refl_t[..., None], reflect_local(wi), -wi)
        put(
            p.type == T.THINDIELECTRIC,
            wo_t,
            p.spec,
            jnp.where(refl_t, Rp, 1.0 - Rp),
            jnp.ones_like(sel),
        )

    if has(T.NULL):
        put(
            p.type == T.NULL,
            -wi,
            jnp.ones_like(weight),
            jnp.ones_like(pdf),
            jnp.ones_like(sel),
        )

    if has(T.ROUGH_CONDUCTOR, T.ROUGH_PLASTIC):
        # GGX VNDF shared by the microfacet-coated families
        m = ggx_sample_vndf(wi2, p.alpha, u2)
        wo_rc = 2.0 * dot(wi2, m)[..., None] * m - wi2

    if has(T.ROUGH_CONDUCTOR):
        ok = cos_theta(wo_rc) > 1e-6
        F_rc = fresnel_conductor(dot(wi2, m), p.eta, p.k)
        g2 = ggx_g2(wi2, wo_rc, p.alpha)
        g1 = jnp.maximum(ggx_g1(wi2, p.alpha), 1e-8)
        w_rc = p.spec * F_rc * (g2 / g1)[..., None]
        pdf_rc = ggx_vndf_pdf(wi2, m, p.alpha) / jnp.maximum(
            4.0 * jnp.abs(dot(m, wo_rc)), 1e-8
        )
        put(
            p.type == T.ROUGH_CONDUCTOR,
            wo_rc,
            jnp.where(ok[..., None], w_rc, 0.0),
            jnp.where(ok, pdf_rc, 0.0),  # below-horizon reflections rejected
            jnp.zeros_like(sel),
        )

    if has(T.PLASTIC, T.ROUGH_PLASTIC):
        spec_prob, fi_p = _plastic_lobe_probs(p, wi2)
        take_spec = ul < spec_prob

    if has(T.PLASTIC):
        # delta coat or internally-scattered diffuse
        fo_p = fresnel_dielectric(cos_theta(wo_cos), eta_s)
        fdr = _fdr_int(eta_s)
        inv_eta2 = 1.0 / jnp.maximum(eta_s * eta_s, 1e-8)
        w_pl_diff = (
            p.refl
            / jnp.maximum(1.0 - p.refl * fdr[..., None], 1e-3)
            * ((1.0 - fi_p) * (1.0 - fo_p) * inv_eta2 / (1.0 - spec_prob))[..., None]
        )
        w_pl_spec = p.spec * (fi_p / spec_prob)[..., None]
        wo_pl = jnp.where(take_spec[..., None], wo_mirror, wo_cos)
        w_pl = jnp.where(take_spec[..., None], w_pl_spec, w_pl_diff)
        pdf_pl = jnp.where(take_spec, spec_prob, (1.0 - spec_prob) * pdf_cos)
        put(p.type == T.PLASTIC, wo_pl, w_pl, pdf_pl, take_spec)

    if has(T.ROUGH_PLASTIC):
        # GGX coat or diffuse; MIS-combined pdfs
        wo_rp = jnp.where(take_spec[..., None], wo_rc, wo_cos)
        f_rp, pdf_rp = _rough_plastic_eval_pdf(p, wi2, wo_rp)
        w_rp = f_rp / jnp.maximum(pdf_rp, 1e-8)[..., None]
        ok_rp = cos_theta(wo_rp) > 1e-6
        put(
            p.type == T.ROUGH_PLASTIC,
            wo_rp,
            jnp.where(ok_rp[..., None], w_rp, 0.0),
            jnp.where(ok_rp, pdf_rp, 0.0),
            jnp.zeros_like(sel),
        )

    if has(T.PHONG):
        # lobe select between cosine and specular-lobe sampling
        n_ph = _phong_exponent(p)
        sp_ph = _phong_lobe_probs(p)
        take_spec_ph = ul < sp_ph
        cos_a = jnp.power(jnp.maximum(u2[..., 0], 1e-9), 1.0 / (n_ph + 1.0))
        sin_a = safe_sqrt(1.0 - cos_a * cos_a)
        phi = 2.0 * jnp.pi * u2[..., 1]
        local_lobe = jnp.stack(
            [sin_a * jnp.cos(phi), sin_a * jnp.sin(phi), cos_a], axis=-1
        )
        from mitsuba_path_guiding_tpu.core.math import Frame

        r_dir = reflect_local(wi2)
        wo_ph_spec = Frame.from_normal(r_dir).to_world(local_lobe)
        wo_ph = jnp.where(take_spec_ph[..., None], wo_ph_spec, wo_cos)
        f_ph, pdf_ph = _phong_eval_pdf(p, wi2, wo_ph)
        w_ph = f_ph / jnp.maximum(pdf_ph, 1e-8)[..., None]
        ok_ph = cos_theta(wo_ph) > 0.0
        put(
            p.type == T.PHONG,
            wo_ph,
            jnp.where(ok_ph[..., None], w_ph, 0.0),
            pdf_ph,
            jnp.zeros_like(sel),
        )

    if not has(T.ROUGH_DIELECTRIC):
        # un-flip wo back to the true frame for two-sided families
        wo = jnp.stack([wo[..., 0], wo[..., 1], wo[..., 2] * s], axis=-1)
        return BSDFSample(wo=wo, weight=weight, pdf=pdf, is_delta=is_delta)

    # ROUGH_DIELECTRIC: VNDF half-vector + fresnel reflect/refract, all in
    # flipped space (wi upper hemisphere), matching _rough_dielectric_eval_pdf
    flip_rd = jnp.where(cos_theta(wi) >= 0.0, 1.0, -1.0)
    wi_rd = jnp.stack([wi[..., 0], wi[..., 1], wi[..., 2] * flip_rd], axis=-1)
    m_rd = ggx_sample_vndf(wi_rd, p.alpha, u2)  # upper hemisphere
    eta_rel_rd = jnp.where(cos_theta(wi) >= 0.0, eta_s, 1.0 / eta_s)
    wim_rd = dot(wi_rd, m_rd)  # > 0 by VNDF construction
    F_rd = fresnel_dielectric(wim_rd, eta_rel_rd)  # = 1 under TIR
    take_refl_rd = ul < F_rd
    wo_rd_refl = 2.0 * wim_rd[..., None] * m_rd - wi_rd
    # refraction about m (Walter eq. 40) in flipped space
    inv_e = 1.0 / eta_rel_rd
    c2 = 1.0 - (1.0 - wim_rd * wim_rd) * inv_e * inv_e
    wo_rd_refr = (inv_e * wim_rd - safe_sqrt(c2))[..., None] * m_rd - inv_e[
        ..., None
    ] * wi_rd
    wo_rd_f = jnp.where(take_refl_rd[..., None], wo_rd_refl, wo_rd_refr)
    wo_rd_f = normalize(wo_rd_f)
    # reject hemisphere-inconsistent results (reflection below horizon /
    # refraction above) — reference roughdielectric.cpp does the same;
    # without this the spillover lands under the *other* branch's pdf
    consistent_rd = take_refl_rd == (cos_theta(wo_rd_f) > 0.0)
    # un-flip
    wo_rd = jnp.stack(
        [wo_rd_f[..., 0], wo_rd_f[..., 1], wo_rd_f[..., 2] * flip_rd], axis=-1
    )
    f_rd, pdf_rd = _rough_dielectric_eval_pdf(p, wi, wo_rd)
    w_rd = f_rd / jnp.maximum(pdf_rd, 1e-8)[..., None]
    ok_rd = consistent_rd & (pdf_rd > 1e-9)
    put(
        p.type == BSDFType.ROUGH_DIELECTRIC,
        wo_rd,
        jnp.where(ok_rd[..., None], w_rd, 0.0),
        jnp.where(ok_rd, pdf_rd, 0.0),
        jnp.zeros_like(sel),
    )

    # un-flip wo back to the true frame for two-sided families
    wo = jnp.stack([wo[..., 0], wo[..., 1], wo[..., 2] * s], axis=-1)
    # transmissive types already produced true-frame wo; s==1 for them
    return BSDFSample(wo=wo, weight=weight, pdf=pdf, is_delta=is_delta)


def _coat_sample(mats, p, wi, u2, ul, types, tex, res: BSDFSample, mid=None) -> BSDFSample:
    """COATING lanes of the wavefront (coating.cpp sample): choose the
    delta reflection with probability R12 (specularSamplingWeight = 1/2),
    otherwise refract in, sample the nested lobe, attenuate and refract
    back out.  Overrides ``res`` where the lane's material is COATING."""
    is_coat = p.type == BSDFType.COATING
    eta_c = jnp.maximum(p.eta[..., 0], 1e-3)
    wi2, s = _flip_two_sided(p, wi)
    wi_in, R12 = _coat_refract(wi2, eta_c)
    p_spec = R12
    choose_spec = ul < p_spec

    # nested lobe with the refracted incident direction
    ul_n = jnp.clip(
        (ul - p_spec) / jnp.maximum(1.0 - p_spec, 1e-9), 0.0, 1.0 - 1e-7
    )
    pc = gather_params(mats, jnp.maximum(p.sub_a, 0), tex)
    sub = _sample_families(pc, wi_in, u2, ul_n, types)
    wo_in = sub.wo
    sa = p.refl * p.weight[..., None]
    absorb = jnp.exp(
        -sa
        * (
            1.0 / jnp.maximum(jnp.abs(wi_in[..., 2]), 1e-6)
            + 1.0 / jnp.maximum(jnp.abs(wo_in[..., 2]), 1e-6)
        )[..., None]
    )
    wo_out, R21 = _coat_refract(wo_in, 1.0 / eta_c)  # refract OUT of the layer
    tir = (R21 >= 1.0) | (R12 >= 1.0)
    inv_eta2 = 1.0 / (eta_c * eta_c)
    czo_in = jnp.where(jnp.abs(wo_in[..., 2]) < 1e-6, 1e-6, wo_in[..., 2])
    cos_ratio = wo_out[..., 2] / czo_in
    # measure-compression factors cancel inside the weight; only the
    # transmittances, absorption, and the 1/(1-probSpecular) survive
    w_n = (
        sub.weight
        * absorb
        * ((1.0 - R12) * (1.0 - R21) / jnp.maximum(1.0 - p_spec, 1e-9))[..., None]
    )
    pdf_n = sub.pdf * (1.0 - p_spec) * jnp.where(
        sub.is_delta, 1.0, inv_eta2 * cos_ratio
    )
    ok_n = ~tir & (sub.pdf > 0.0)
    # coat reflection: delta mirror (coating.cpp) or GGX VNDF sample
    # (roughcoating.cpp) when the interface is rough
    rough_c = p.alpha > 1e-3
    m_r = ggx_sample_vndf(wi2, p.alpha, u2)
    wo_ggx = 2.0 * dot(wi2, m_r)[..., None] * m_r - wi2
    wo_spec = jnp.where(rough_c[..., None], wo_ggx, reflect_local(wi2))
    wo_c = jnp.where(choose_spec[..., None], wo_spec, wo_out)
    # rough-coat lanes with a SMOOTH outcome (either branch) re-weight by
    # the full one-sample-MIS estimator f/pdf over the mixed pdf — the
    # ROUGH_PLASTIC pattern; keeps sample weights == eval/pdf exactly
    f_full, pdf_full = _coating_f_pdf(
        p, pc, wi2, wo_c, types,
        tcoat=None if mid is None else _gather_coat_trans(mats, mid),
    )
    smooth_out = rough_c & ~(jnp.where(choose_spec, False, sub.is_delta))
    ok_r = pdf_full > 1e-9
    w_full = f_full / jnp.maximum(pdf_full, 1e-9)[..., None]
    w_c = jnp.where(
        choose_spec[..., None], p.spec, jnp.where(ok_n[..., None], w_n, 0.0)
    )
    pdf_c = jnp.where(choose_spec, jnp.maximum(p_spec, 1e-9), jnp.where(ok_n, pdf_n, 0.0))
    w_c = jnp.where(smooth_out[..., None],
                    jnp.where(ok_r[..., None], w_full, 0.0), w_c)
    pdf_c = jnp.where(smooth_out, jnp.where(ok_r, pdf_full, 0.0), pdf_c)
    delta_c = jnp.where(choose_spec, ~rough_c, sub.is_delta)
    wo_c = jnp.stack(
        [wo_c[..., 0], wo_c[..., 1], wo_c[..., 2] * s], axis=-1
    )  # un-flip the two-sided mirror
    return BSDFSample(
        wo=jnp.where(is_coat[..., None], wo_c, res.wo),
        weight=jnp.where(is_coat[..., None], w_c, res.weight),
        pdf=jnp.where(is_coat, pdf_c, res.pdf),
        is_delta=jnp.where(is_coat, delta_c, res.is_delta),
    )


def sample_raw(mats: Materials, mid, wi, u, types=ALL_TYPES, tex=None,
               cloth_aux=None) -> BSDFSample:
    """Wavefront BSDF sampling with one level of nesting resolved.

    BLEND (blendbsdf.cpp sample): pick lobe B with probability ``weight``,
    sample it, then re-weight smooth samples by the full mixture
    eval/pdf; delta picks keep the component result (the pick probability
    cancels against the component's blend factor).
    MASK (mask.cpp sample): with probability (1 - opacity) pass straight
    through (delta, weight 1); otherwise sample the nested lobe — opacity
    cancels the same way; the smooth pdf gains the opacity factor.
    """
    p = gather_params(mats, mid, tex)
    u2 = u[..., 0:2]
    ul = u[..., 2]
    nested = (BSDFType.BLEND in types) or (BSDFType.MASK in types)
    has_coat = BSDFType.COATING in types
    if not nested:
        res = _sample_families(p, wi, u2, ul, types, cloth_aux=cloth_aux)
        if has_coat:
            res = _coat_sample(mats, p, wi, u2, ul, types, tex, res, mid=mid)
        return res

    is_blend = p.type == BSDFType.BLEND
    is_mask = p.type == BSDFType.MASK
    w_sel = p.weight
    pick_b = is_blend & (ul < w_sel)
    mask_pass = is_mask & (ul >= w_sel)  # 1-opacity pass-through mass
    use_sub = (is_blend | is_mask) & ~mask_pass
    sub_mid = jnp.where(pick_b, p.sub_b, p.sub_a)
    p_sub = gather_params(mats, jnp.maximum(sub_mid, 0), tex)
    p_eff = jax.tree.map(
        lambda a, b: jnp.where(
            use_sub.reshape(use_sub.shape + (1,) * (a.ndim - use_sub.ndim)), b, a
        ),
        p,
        p_sub,
    )
    # stretch the lobe-select uniform back to [0,1) inside the pick
    denom_b = jnp.where(pick_b, jnp.maximum(w_sel, 1e-9), jnp.maximum(1.0 - w_sel, 1e-9))
    ul_eff = jnp.where(
        is_blend,
        jnp.clip(jnp.where(pick_b, ul / denom_b, (ul - w_sel) / denom_b), 0.0, 1.0 - 1e-7),
        jnp.where(is_mask, jnp.clip(ul / jnp.maximum(w_sel, 1e-9), 0.0, 1.0 - 1e-7), ul),
    )
    res = _sample_families(p_eff, wi, u2, ul_eff, types, cloth_aux=cloth_aux)

    wo, weight, pdf, is_delta = res.wo, res.weight, res.pdf, res.is_delta
    # mask pass-through: delta transmission, weight 1 (opacity cancels)
    pass_w = jnp.ones_like(weight)
    wo = jnp.where(mask_pass[..., None], -wi, wo)
    weight = jnp.where(mask_pass[..., None], pass_w, weight)
    pdf = jnp.where(mask_pass, 1.0 - w_sel, pdf)
    is_delta = jnp.where(mask_pass, True, is_delta)

    # smooth samples from nested lobes: full-mixture re-weight
    smooth_sub = use_sub & ~is_delta
    f_mix, pdf_mix = eval_pdf_raw(mats, mid, wi, wo, types=types, tex=tex,
                                  cloth_aux=cloth_aux)
    ok = smooth_sub & (pdf_mix > 1e-9)
    weight = jnp.where(
        ok[..., None], f_mix / jnp.maximum(pdf_mix, 1e-9)[..., None], weight
    )
    weight = jnp.where((smooth_sub & ~ok)[..., None], 0.0, weight)
    pdf = jnp.where(smooth_sub, pdf_mix, pdf)
    # delta picks from nested lobes: component result stands; pdf is the
    # discrete pick probability times the component's own discrete pdf
    delta_sub = use_sub & is_delta
    p_pick = jnp.where(is_mask, w_sel, jnp.where(pick_b, w_sel, 1.0 - w_sel))
    pdf = jnp.where(delta_sub, pdf * p_pick, pdf)
    res = BSDFSample(wo=wo, weight=weight, pdf=pdf, is_delta=is_delta)
    if has_coat:
        res = _coat_sample(mats, p, wi, u2, ul, types, tex, res, mid=mid)
    return res


# jitted public entry points (tests / direct use); integrators call the
# *_raw versions inside their own jit — a nested-jit call boundary can
# block XLA fusion across the BSDF stage
eval_pdf = partial(jax.jit, static_argnames=("types",))(eval_pdf_raw)
albedo = jax.jit(albedo_raw)
sample = partial(jax.jit, static_argnames=("types",))(sample_raw)
