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


def eval_pdf_raw(mats: Materials, mid, wi, wo, types=ALL_TYPES, tex=None):
    """(f*cos (N,3), pdf (N,)) for the smooth component; 0 for delta mats.

    BLEND rows evaluate both nested lobes and mix by weight
    (blendbsdf.cpp eval/pdf); MASK rows scale the nested lobe by opacity
    (mask.cpp — the (1-opacity) pass-through is a delta lobe, invisible
    to smooth eval)."""
    p = gather_params(mats, mid, tex)
    wi2, s = _flip_two_sided(p, wi)
    wo2 = jnp.stack([wo[..., 0], wo[..., 1], wo[..., 2] * s], axis=-1)
    f, pdf = _eval_smooth(p, wi2, wo2, types)
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


def _sample_families(p: _P, wi, u2, ul, types) -> BSDFSample:
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
    if has(T.DIFFUSE, T.ROUGH_DIFFUSE, T.PLASTIC, T.ROUGH_PLASTIC, T.PHONG, T.WARD, T.DIFFTRANS):
        wo_cos = square_to_cosine_hemisphere(u2)
        pdf_cos = square_to_cosine_hemisphere_pdf(wo_cos)
    if has(T.CONDUCTOR, T.PLASTIC):
        wo_mirror = reflect_local(wi2)

    if has(T.DIFFUSE):
        put(p.type == T.DIFFUSE, wo_cos, p.refl, pdf_cos, jnp.zeros_like(sel))

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


def sample_raw(mats: Materials, mid, wi, u, types=ALL_TYPES, tex=None) -> BSDFSample:
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
        res = _sample_families(p, wi, u2, ul, types)
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
    res = _sample_families(p_eff, wi, u2, ul_eff, types)

    wo, weight, pdf, is_delta = res.wo, res.weight, res.pdf, res.is_delta
    # mask pass-through: delta transmission, weight 1 (opacity cancels)
    pass_w = jnp.ones_like(weight)
    wo = jnp.where(mask_pass[..., None], -wi, wo)
    weight = jnp.where(mask_pass[..., None], pass_w, weight)
    pdf = jnp.where(mask_pass, 1.0 - w_sel, pdf)
    is_delta = jnp.where(mask_pass, True, is_delta)

    # smooth samples from nested lobes: full-mixture re-weight
    smooth_sub = use_sub & ~is_delta
    f_mix, pdf_mix = eval_pdf_raw(mats, mid, wi, wo, types=types, tex=tex)
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
