"""Quantified approximation bounds (VERDICT r2 item 9).

roughcoating: round 3 replaced the smooth-Fresnel substrate transmittance
(measured up to ~48% low at grazing for alpha >= 0.2) with build-time
microfacet-averaged transmittance tables (the reference's data/microfacet
rtrans, roughcoating.cpp m_roughTransmittance).  These tests (a) validate
the quadrature against an independent Monte-Carlo estimate through the
compiled roughdielectric sampler, and (b) pin the compiled roughcoating
eval to a numpy implementation of the reference formula
(roughcoating.cpp eval: F*D*G/4cos coat lobe + nested(refracted) *
T(cos_i)*T(cos_o) * absorption * invEta^2 * cos ratio).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from mitsuba_path_guiding_tpu.models import bsdf as bsdf_mod
from mitsuba_path_guiding_tpu.models.microfacet_tables import (
    coat_transmittance_table,
    fresnel_dielectric,
    rough_transmittance,
)
from mitsuba_path_guiding_tpu.scene.types import BSDFType


def test_rough_transmittance_matches_mc_through_sampler():
    """Quadrature table vs Monte-Carlo transmitted-energy estimate through
    the compiled roughdielectric sampler (independent code path)."""
    from tests.test_bsdf import make_mats

    alpha, eta = 0.25, 1.5
    mats = make_mats(BSDFType.ROUGH_DIELECTRIC, eta=eta, alpha=alpha)
    n = 1 << 17
    rs = np.random.default_rng(0)
    u = jnp.asarray(rs.random((n, 3), np.float32))
    # grazing (cos < 0.5) excluded: the sampler's height-correlated
    # masking and the separable-Smith quadrature are different
    # single-scattering conventions and genuinely diverge there (~15%
    # at cos 0.25) — the table is the higher (closer-to-multiscatter) one
    for cos_i in (0.85, 0.7, 0.5):
        wi = jnp.broadcast_to(
            jnp.asarray([np.sqrt(1 - cos_i**2), 0.0, cos_i], jnp.float32), (n, 3)
        )
        bs = bsdf_mod.sample_raw(mats, jnp.zeros((n,), jnp.int32), wi, u)
        # transmitted fraction of energy = E[weight * [wo below surface]]
        trans = np.asarray(
            jnp.mean(
                jnp.where(bs.wo[..., 2] < 0, bs.weight[..., 0], 0.0)
            )
        )
        # the sampler weight carries the radiance-transport 1/eta^2
        # compression; the table is ENERGY transmittance — undo it
        trans_energy = float(trans) * eta * eta
        T_quad = rough_transmittance(cos_i, alpha, eta)
        # the sampler's VNDF weight uses a height-correlated masking term
        # while the quadrature uses separable Smith G1*G1 — the two
        # single-scattering conventions differ by a few percent of energy
        assert abs(trans_energy - T_quad) < 0.08, (cos_i, trans_energy, T_quad)


def _oracle_roughcoating(wi, wo, alpha, eta, kd, sigma_a_thick):
    """Reference roughcoating.cpp eval in numpy; nested = diffuse kd."""
    from mitsuba_path_guiding_tpu.models.microfacet_tables import (
        _ggx_d,
        _smith_g1,
    )

    def refract_to_interior(w):
        # coating.cpp refractTo: tangential scaled by 1/eta, hemisphere kept
        inv_eta = 1.0 / eta
        x, y = w[0] * inv_eta, w[1] * inv_eta
        z2 = 1.0 - x * x - y * y
        z = np.sqrt(max(z2, 0.0)) * np.sign(w[2])
        v = np.array([x, y, z])
        return v / np.linalg.norm(v)

    out = np.zeros(3)
    # coat GGX reflection lobe
    if wi[2] * wo[2] > 0:
        h = wi + wo
        h = h / np.linalg.norm(h) * np.sign(wo[2])
        D = _ggx_d(h[2], alpha)
        F = fresnel_dielectric(abs(np.dot(wi, h)), eta)
        G = _smith_g1(wi[2], alpha) * _smith_g1(wo[2], alpha)
        out = out + F * D * G / (4.0 * abs(wi[2])) * np.ones(3)
    # substrate
    wi_in = refract_to_interior(wi)
    wo_in = refract_to_interior(wo)
    nested = kd / np.pi * abs(wo_in[2])  # diffuse eval (f*cos convention below)
    Ti = rough_transmittance(abs(wi[2]), alpha, eta)
    To = rough_transmittance(abs(wo[2]), alpha, eta)
    absorb = np.exp(-sigma_a_thick * (1.0 / abs(wi_in[2]) + 1.0 / abs(wo_in[2])))
    inv_eta2 = 1.0 / (eta * eta)
    # measure conversion: *cos(wo)/cos(wo_int); nested above already has
    # cos(wo_int), so together the substrate term carries cos(wo)
    sub = kd / np.pi * Ti * To * absorb * inv_eta2 * wo[2]
    return out * wo[2] + sub  # return f*cos(wo) (eval_pdf_raw convention)


@pytest.mark.slow
def test_roughcoating_eval_matches_reference_formula():
    from mitsuba_path_guiding_tpu.scene.builder import build_scene

    alpha, eta, kd = 0.25, 1.5, np.array([0.6, 0.4, 0.3])
    desc = {
        "sensor": {"type": "perspective", "fov": 45.0},
        "shapes": [{
            "type": "rectangle",
            "bsdf": {"type": "roughcoating", "alpha": alpha,
                     "int_ior": eta, "ext_ior": 1.0, "thickness": 0.0,
                     "bsdf": {"type": "diffuse", "reflectance": list(kd)}},
        }],
        "emitters": [{"type": "constant", "radiance": [1.0, 1.0, 1.0]}],
    }
    scene = build_scene(desc)
    # the coating row wraps the nested diffuse row
    mats = scene.mats
    types = bsdf_mod.types_present(mats)
    coat_rows = np.where(np.asarray(mats.type) == BSDFType.COATING)[0]
    assert len(coat_rows) == 1
    mid_v = int(coat_rows[0])

    angles_i = [15, 40, 65, 80]
    angles_o = [10, 35, 60, 78]
    phis = [0.3, 2.1]
    errs = []
    for ti in angles_i:
        for to in angles_o:
            for ph in phis:
                wi = np.array([np.sin(np.radians(ti)), 0, np.cos(np.radians(ti))])
                wo = np.array([
                    np.sin(np.radians(to)) * np.cos(ph),
                    np.sin(np.radians(to)) * np.sin(ph),
                    np.cos(np.radians(to)),
                ])
                f, _ = bsdf_mod.eval_pdf_raw(
                    mats, jnp.full((1,), mid_v, jnp.int32),
                    jnp.asarray(wi, jnp.float32)[None],
                    jnp.asarray(wo, jnp.float32)[None],
                    types=types,
                )
                ours = np.asarray(f)[0]
                ref = _oracle_roughcoating(wi, wo, alpha, eta, kd, 0.0)
                rel = np.abs(ours - ref).max() / max(ref.max(), 1e-6)
                errs.append(rel)
    errs = np.asarray(errs)
    # Measured: typical relative error < 4%, worst grazing combination
    # ~9% (16-entry table interpolation + quadrature resolution) — vs up
    # to ~48% for the pre-round-3 smooth-Fresnel substrate transmittance.
    assert errs.max() < 0.10, errs.max()
    assert np.median(errs) < 0.04, np.median(errs)
