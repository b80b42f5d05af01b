"""Volumetric path tracer tests: phase chi-square, absorption-only analytic
transmittance, zero-density equivalence with the surface integrator, and
scattering energy sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_path_guiding_tpu.core import chi2
from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.models.phase import phase_eval, phase_sample
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box, volumetric_box
from mitsuba_path_guiding_tpu.scene.transforms import look_at, rotate, scale, translate

N = 150_000


@pytest.mark.parametrize("g", [0.0, 0.4, -0.6, 0.9])
def test_phase_chi2(g):
    wi = jnp.broadcast_to(jnp.asarray([0.36, -0.48, 0.8], jnp.float32), (N, 3))
    u = jax.random.uniform(jax.random.PRNGKey(int(g * 10) + 5), (N, 2))
    wo, pdf = phase_sample(wi, jnp.full((N,), g), u)

    def pdf_fn(dirs):
        m = dirs.shape[0]
        wi_m = jnp.broadcast_to(jnp.asarray([0.36, -0.48, 0.8], jnp.float32), (m, 3))
        return np.asarray(phase_eval(wi_m, jnp.asarray(dirs), jnp.full((m,), g)))

    passed, p, msg = chi2.chi2_test_sphere(np.asarray(wo), pdf_fn)
    assert passed, f"g={g}: {msg}"


def test_phase_normalization():
    # pdf integrates to 1 over the sphere for strong anisotropy
    nt, nh = 512, 1024
    t = (np.arange(nt) + 0.5) / nt * np.pi
    h = (np.arange(nh) + 0.5) / nh * 2 * np.pi
    TT, HH = np.meshgrid(t, h, indexing="ij")
    d = np.stack([np.sin(TT) * np.cos(HH), np.sin(TT) * np.sin(HH), np.cos(TT)], -1)
    dA = (np.pi / nt) * (2 * np.pi / nh) * np.sin(TT)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (d.size // 3, 3))
    for g in [0.0, 0.9, -0.9]:
        pv = np.asarray(
            phase_eval(wi, jnp.asarray(d.reshape(-1, 3), jnp.float32), jnp.full((d.size // 3,), g))
        ).reshape(TT.shape)
        assert abs((pv * dA).sum() - 1.0) < 2e-3, g


def _emissive_wall_scene(sigma_a, sigma_s, g=0.0):
    """Camera 2 units from an emissive wall; medium in between."""
    return {
        "sensor": {
            "type": "perspective",
            "fov": 30.0,
            "to_world": look_at([0, 0, -2], [0, 0, 0]),
        },
        "shapes": [
            {
                "type": "rectangle",
                "to_world": translate(0, 0, 0) @ rotate([1, 0, 0], 180) @ scale(4),
                "bsdf": {"type": "diffuse", "reflectance": [0, 0, 0]},
                "emitter": {"radiance": [2.0, 2.0, 2.0]},
            }
        ],
        "emitters": [],
        "medium": {"sigma_a": [sigma_a] * 3, "sigma_s": [sigma_s] * 3, "g": g},
    }


def test_absorption_only_beer_lambert():
    """Pure absorption: center pixel = Le * exp(-sigma_a * distance)."""
    sigma_a = 0.7
    sc = build_scene(_emissive_wall_scene(sigma_a, 0.0))
    img = np.asarray(
        render(sc, RenderConfig(width=8, height=8, spp=2048, max_depth=3, seed=0))
    )
    expect = 2.0 * np.exp(-sigma_a * 2.0)
    got = img[2:6, 2:6].mean()
    # distance-sampling pass/absorb is Bernoulli per sample -> needs spp
    assert abs(got - expect) / expect < 0.02, (got, expect)


def test_zero_density_matches_surface_integrator():
    sc_v = build_scene(volumetric_box(sigma_s=0.0, sigma_a=0.0))
    sc_s = build_scene(cornell_box())
    cfg = RenderConfig(width=24, height=24, spp=48, max_depth=4, seed=0)
    img_v = np.asarray(render(sc_v, cfg._replace(integrator="volpath")))
    img_s = np.asarray(render(sc_s, cfg._replace(seed=3)))
    assert np.isfinite(img_v).all()
    assert abs(img_v.mean() - img_s.mean()) / img_s.mean() < 0.05


def test_scattering_medium_renders():
    sc = build_scene(volumetric_box(sigma_s=0.5, sigma_a=0.05, g=0.3))
    img = np.asarray(
        render(sc, RenderConfig(width=24, height=24, spp=16, max_depth=6, seed=1))
    )
    assert np.isfinite(img).all()
    assert img.mean() > 0.01
    # scattering medium brightens shadowed regions vs vacuum (light bleeds)
    sc0 = build_scene(cornell_box())
    img0 = np.asarray(
        render(sc0, RenderConfig(width=24, height=24, spp=16, max_depth=6, seed=1))
    )
    assert img.mean() != img0.mean()


def test_nee_toggle_agreement_volumetric():
    """fork useNee parity check in the volumetric integrator."""
    sc = build_scene(volumetric_box(sigma_s=0.4, sigma_a=0.05, g=0.0, light_scale=1.0))
    a = np.asarray(
        render(sc, RenderConfig(width=16, height=16, spp=64, max_depth=6, seed=0))
    )
    b = np.asarray(
        render(
            sc,
            RenderConfig(width=16, height=16, spp=512, max_depth=6, seed=7, use_nee=False),
        )
    )
    assert abs(a.mean() - b.mean()) / a.mean() < 0.08, (a.mean(), b.mean())


def test_rayleigh_chi2():
    from mitsuba_path_guiding_tpu.models.phase import rayleigh_eval, rayleigh_sample

    wi = jnp.broadcast_to(jnp.asarray([0.36, -0.48, 0.8], jnp.float32), (N, 3))
    u = jax.random.uniform(jax.random.PRNGKey(11), (N, 2))
    wo, pdf = rayleigh_sample(wi, u)
    np.testing.assert_allclose(
        np.asarray(pdf),
        np.asarray(rayleigh_eval(wi, wo)),
        rtol=1e-5,
    )

    def pdf_fn(dirs):
        m = dirs.shape[0]
        wi_m = jnp.broadcast_to(jnp.asarray([0.36, -0.48, 0.8], jnp.float32), (m, 3))
        return np.asarray(rayleigh_eval(wi_m, jnp.asarray(dirs)))

    passed, p, msg = chi2.chi2_test_sphere(np.asarray(wo), pdf_fn)
    assert passed, msg


# ---------------------------------------------------------------------------
# fiber phases: Kajiya-Kay + microflake (reference kkay.cpp, microflake.cpp)
# ---------------------------------------------------------------------------

def _fiber_medium(phase, **kw):
    from mitsuba_path_guiding_tpu.scene.builder import _compile_medium

    spec = {"sigma_a": [0.1] * 3, "sigma_s": [0.5] * 3, "phase": phase,
            "orientation": [0.3, 0.5, 0.81], **kw}
    return _compile_medium(spec)


def test_kkay_normalized_and_weighted():
    """kd-only kkay integrates to kd (not 1 — the reference's kd/ks are
    direct scaling factors); sampling weight = eval*4pi matches eval/pdf."""
    from mitsuba_path_guiding_tpu.models.phase import (
        PhaseKind, phase_eval_kind, phase_sample_kind_w,
    )

    med = _fiber_medium("kkay", ks=0.4, kd=0.2, exponent=4.0)
    nt, nh = 256, 512
    t = (np.arange(nt) + 0.5) / nt * np.pi
    h = (np.arange(nh) + 0.5) / nh * 2 * np.pi
    TT, HH = np.meshgrid(t, h, indexing="ij")
    d = np.stack([np.sin(TT) * np.cos(HH), np.sin(TT) * np.sin(HH), np.cos(TT)], -1)
    dA = (np.pi / nt) * (2 * np.pi / nh) * np.sin(TT)
    m = d.size // 3
    wi = jnp.broadcast_to(jnp.asarray([0.8, 0.0, 0.6]), (m, 3))
    pv = np.asarray(
        phase_eval_kind(wi, jnp.asarray(d.reshape(-1, 3), jnp.float32), 0.0,
                        PhaseKind.KKAY, med)
    ).reshape(TT.shape)
    total = (pv * dA).sum()
    # ks cos^e cone (normalized for perpendicular wi) + kd floor: for this
    # oblique wi the specular part integrates close to ks
    assert 0.45 < total < 0.75, total
    # sampled weight consistency: weight == eval / pdf
    n = 8192
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, 2))
    wi_s = jnp.broadcast_to(jnp.asarray([0.8, 0.0, 0.6]), (n, 3))
    wo, pdf, w = phase_sample_kind_w(wi_s, 0.0, u, PhaseKind.KKAY, med)
    ev = phase_eval_kind(wi_s, wo, 0.0, PhaseKind.KKAY, med)
    np.testing.assert_allclose(np.asarray(w), np.asarray(ev / pdf), rtol=1e-4)


def test_microflake_chi2():
    from mitsuba_path_guiding_tpu.models.phase import (
        PhaseKind, phase_eval_kind, phase_sample_kind_w,
    )

    med = _fiber_medium("microflake", stddev=0.25)
    wi = jnp.broadcast_to(jnp.asarray([0.36, -0.48, 0.8], jnp.float32), (N, 3))
    u = jax.random.uniform(jax.random.PRNGKey(7), (N, 2))
    wo, pdf, w = phase_sample_kind_w(wi, 0.0, u, PhaseKind.MICROFLAKE, med)
    ok = np.asarray(w) > 0
    assert ok.mean() > 0.98, ok.mean()  # K-round rejection rarely fails

    def pdf_fn(dirs):
        m = dirs.shape[0]
        wi_m = jnp.broadcast_to(jnp.asarray([0.36, -0.48, 0.8], jnp.float32), (m, 3))
        return np.asarray(
            phase_eval_kind(wi_m, jnp.asarray(dirs), 0.0, PhaseKind.MICROFLAKE, med)
        )

    passed, p, msg = chi2.chi2_test_sphere(
        np.asarray(wo)[ok], pdf_fn, sample_count=N
    )
    assert passed, msg


def test_microflake_normalization():
    """The phase function must integrate to 1 over the sphere (flake
    conservation: 0.5 D/sigma_t construction, Jakob et al. 2010)."""
    from mitsuba_path_guiding_tpu.models.phase import PhaseKind, phase_eval_kind

    med = _fiber_medium("microflake", stddev=0.3)
    nt, nh = 512, 512
    t = (np.arange(nt) + 0.5) / nt * np.pi
    h = (np.arange(nh) + 0.5) / nh * 2 * np.pi
    TT, HH = np.meshgrid(t, h, indexing="ij")
    d = np.stack([np.sin(TT) * np.cos(HH), np.sin(TT) * np.sin(HH), np.cos(TT)], -1)
    dA = (np.pi / nt) * (2 * np.pi / nh) * np.sin(TT)
    m = d.size // 3
    wi = jnp.broadcast_to(jnp.asarray([0.6, 0.0, 0.8]), (m, 3))
    pv = np.asarray(
        phase_eval_kind(wi, jnp.asarray(d.reshape(-1, 3), jnp.float32), 0.0,
                        PhaseKind.MICROFLAKE, med)
    ).reshape(TT.shape)
    assert abs((pv * dA).sum() - 1.0) < 0.02, (pv * dA).sum()


def test_hg_forward_peak_convention():
    """Regression: g > 0 must scatter FORWARD along the propagation
    direction as volpath calls it (wi = -ray.d, the reference's pRec.wi)."""
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (20000, 3))
    u = jax.random.uniform(jax.random.PRNGKey(0), (20000, 2))
    wo, _ = phase_sample(-d, jnp.full((20000,), 0.9), u)  # wi = -d
    mean_fwd = float(jnp.mean(jnp.sum(wo * d, -1)))
    assert mean_fwd > 0.85, mean_fwd


def test_microflake_directional_extinction():
    """Directional sigma_t coupling (microflake.cpp): transmittance along
    the fiber axis exceeds transmittance across it (projected flake area
    is smallest along the axis for small stddev), and renders reflect it."""
    from mitsuba_path_guiding_tpu.integrators.volpath import trace_vol
    from mitsuba_path_guiding_tpu.models.phase import PhaseKind, _mf_sigma_t
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import volumetric_box

    med = _fiber_medium("microflake", stddev=0.25)
    # sigma table: smallest projected area along the fiber (cos=1)
    along = float(_mf_sigma_t(med.sigt_table, jnp.asarray([1.0]))[0])
    across = float(_mf_sigma_t(med.sigt_table, jnp.asarray([0.0]))[0])
    assert along < across, (along, across)

    # e2e: the same scene, fiber along +z (the camera axis) vs +x, differs
    def render_axis(axis):
        desc = volumetric_box(sigma_s=0.6, sigma_a=0.1, g=0.0)
        desc["medium"]["phase"] = "microflake"
        desc["medium"]["stddev"] = 0.25
        desc["medium"]["orientation"] = axis
        sc = build_scene(desc)
        from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render

        return np.asarray(render(sc, RenderConfig(width=16, height=16, spp=32, max_depth=6, seed=0)))

    img_z = render_axis([0.0, 0.0, 1.0])
    img_x = render_axis([1.0, 0.0, 0.0])
    assert np.isfinite(img_z).all() and np.isfinite(img_x).all()
    rel = abs(img_z.mean() - img_x.mean()) / max(img_z.mean(), 1e-9)
    assert rel > 0.02, rel


# ---------------------------------------------------------------------------
# mixture phase (reference mixturephase.cpp)
# ---------------------------------------------------------------------------

def test_mixture_phase_chi2():
    """Chi2 + normalization + eval==pdf for a 3-component mixture
    (mixturephase.cpp: weighted sum, balance pdf over all components)."""
    from mitsuba_path_guiding_tpu.models.phase import (
        MIX_HG,
        MIX_RAYLEIGH,
        mixture_eval,
        mixture_sample,
    )

    weights = jnp.asarray([0.5, 0.3, 0.2], jnp.float32)
    gs = jnp.asarray([0.7, 0.0, -0.4], jnp.float32)
    kinds = jnp.asarray([MIX_HG, MIX_RAYLEIGH, MIX_HG], jnp.int32)
    wi = jnp.broadcast_to(jnp.asarray([0.36, -0.48, 0.8], jnp.float32), (N, 3))
    u = jax.random.uniform(jax.random.PRNGKey(41), (N, 2))
    wo, pdf = mixture_sample(wi, u, weights, gs, kinds)
    # perfectly importance sampled: returned pdf equals eval at wo
    np.testing.assert_allclose(
        np.asarray(pdf), np.asarray(mixture_eval(wi, wo, weights, gs, kinds)), rtol=1e-5
    )

    def pdf_fn(dirs):
        m = dirs.shape[0]
        wi_m = jnp.broadcast_to(jnp.asarray([0.36, -0.48, 0.8], jnp.float32), (m, 3))
        return np.asarray(mixture_eval(wi_m, jnp.asarray(dirs), weights, gs, kinds))

    passed, p, msg = chi2.chi2_test_sphere(np.asarray(wo), pdf_fn)
    assert passed, msg


def test_mixture_phase_e2e_brackets_components():
    """A 50/50 HG(g)/HG(-g) mixture in a homogeneous box must render between
    the two pure-component renders' means (energy is monotone in forward
    scattering toward the camera here) and exactly match when both
    components are identical."""
    from mitsuba_path_guiding_tpu.scene.scenes import volumetric_box

    def render_phase(med_patch):
        desc = volumetric_box(sigma_s=0.6, sigma_a=0.1, g=0.0)
        desc["medium"].update(med_patch)
        sc = build_scene(desc)
        return np.asarray(render(sc, RenderConfig(width=16, height=16, spp=128, max_depth=6, seed=3)))

    img_mix_same = render_phase(
        {
            "phase": "mixture",
            "phase_weights": [0.5, 0.5],
            "phase_components": [{"type": "hg", "g": 0.6}, {"type": "hg", "g": 0.6}],
        }
    )
    img_pure = render_phase({"phase": "hg", "g": 0.6})
    # identical-component mixture is DISTRIBUTIONALLY equal to the pure
    # phase (the CDF-slab remap permutes samples, so only means agree)
    rel = abs(img_mix_same.mean() - img_pure.mean()) / max(img_pure.mean(), 1e-9)
    assert rel < 0.05, (img_mix_same.mean(), img_pure.mean())

    img_mix = render_phase(
        {
            "phase": "mixture",
            "phase_weights": [0.5, 0.5],
            "phase_components": [{"type": "hg", "g": 0.6}, {"type": "hg", "g": -0.6}],
        }
    )
    lo = min(render_phase({"phase": "hg", "g": 0.6}).mean(), render_phase({"phase": "hg", "g": -0.6}).mean())
    hi = max(render_phase({"phase": "hg", "g": 0.6}).mean(), render_phase({"phase": "hg", "g": -0.6}).mean())
    assert lo - 0.02 * hi <= img_mix.mean() <= hi * 1.02 + 1e-6, (lo, img_mix.mean(), hi)
