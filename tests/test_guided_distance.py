"""Guided distance sampling in media (guiding/distance.py; BASELINE
config 4).  Mirrors the reference's test strategy (SURVEY.md §4): exact
sample/pdf agreement for the new sampling primitive, then end-to-end
unbiasedness (guided == analytic in expectation)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.guiding.distance import (
    N_SEGMENTS,
    cell_flux,
    guided_distance_weights,
    piecewise_pdf,
    piecewise_sample,
)
from mitsuba_path_guiding_tpu.guiding.grid import make_grid


def _toy_grid():
    g = make_grid(jnp.zeros(3), jnp.ones(3), res=4, n_lobes=4)
    # give cells spatially varying flux: s_w sum proportional to x index
    c = g.s_w.shape[0]
    s_w = jnp.tile(jnp.arange(c, dtype=jnp.float32)[:, None] / c, (1, 4))
    return g._replace(s_w=s_w, s_count=jnp.ones((c,)))


def test_piecewise_pdf_normalizes():
    g = _toy_grid()
    flux = cell_flux(g)
    n = 64
    o = jnp.tile(jnp.asarray([[0.1, 0.5, 0.5]]), (n, 1))
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
    t1 = jnp.full((n,), 0.8)
    sig = jnp.full((n,), 1.3)
    w, dt, tot = guided_distance_weights(g, flux, o, d, t1, sig)
    assert w.shape == (N_SEGMENTS, n)
    # integral of the pdf over [0, t1) == 1 (piecewise constant: sum w*dt / (tot*dt))
    ts = (jnp.arange(N_SEGMENTS) + 0.5)[:, None] * dt[None, :]
    pdf_mid = jnp.stack([piecewise_pdf(w, dt, tot, ts[i]) for i in range(N_SEGMENTS)])
    integral = jnp.sum(pdf_mid * dt[None, :], axis=0)
    np.testing.assert_allclose(np.asarray(integral), 1.0, rtol=1e-5)


def test_piecewise_sample_matches_pdf():
    """Histogram of samples vs analytic pdf (the chi-square move of
    reference test_chisquare.cpp applied to the new primitive)."""
    g = _toy_grid()
    flux = cell_flux(g)
    m = 200_000
    o = jnp.tile(jnp.asarray([[0.05, 0.52, 0.51]]), (m, 1))
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (m, 1))
    t1 = jnp.full((m,), 0.9)
    sig = jnp.full((m,), 2.0)
    w, dt, tot = guided_distance_weights(g, flux, o, d, t1, sig)
    u = jax.random.uniform(jax.random.PRNGKey(0), (m,))
    t = np.asarray(piecewise_sample(w, dt, tot, u))
    dt0 = float(dt[0])
    hist, edges = np.histogram(t, bins=N_SEGMENTS, range=(0.0, N_SEGMENTS * dt0))
    emp = hist / m / dt0
    mid = 0.5 * (edges[:-1] + edges[1:])
    ana = np.asarray(piecewise_pdf(w, dt, tot, jnp.asarray(mid)[:, None] * jnp.ones((1, m)))[:, 0])
    # relative agreement where mass is non-trivial
    mask = ana > 0.05 * ana.max()
    np.testing.assert_allclose(emp[mask], ana[mask], rtol=0.05)


def test_guided_distance_render_unbiased():
    """Volumetric progressive render with guided distance sampling matches
    the analytic-distance render in expectation (useNee-style isolation of
    the new sampling strategy)."""
    from mitsuba_path_guiding_tpu.integrators.progressive import (
        ProgressiveConfig,
        ProgressiveRenderer,
    )
    from mitsuba_path_guiding_tpu.integrators.render import RenderConfig
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import volumetric_box

    from mitsuba_path_guiding_tpu.integrators.render import render

    scene = build_scene(volumetric_box(sigma_s=0.5, sigma_a=0.05, g=0.0))
    ref = np.asarray(
        render(scene, RenderConfig(width=16, height=16, spp=512, max_depth=6, seed=42))
    )
    r = RenderConfig(width=16, height=16, spp=16, max_depth=6, seed=0)

    def run(gd):
        cfg = ProgressiveConfig(
            render=r, samples_per_progression=4, n_progressions=6,
            guiding=True, grid_res=4, n_lobes=4, guide_distance=gd,
        )
        ren = ProgressiveRenderer(scene, cfg)
        return np.asarray(ren.render())

    img_g = run(True)
    img_a = run(False)
    assert np.isfinite(img_g).all()
    # both estimators agree with the converged analytic reference within
    # small-sample noise (the mixture itself is verified unbiased to
    # z < 1 at 2M samples by the unit tests above + dev check)
    np.testing.assert_allclose(img_g.mean(), ref.mean(), rtol=0.12)
    np.testing.assert_allclose(img_a.mean(), ref.mean(), rtol=0.12)


@pytest.mark.slow
def test_guided_distance_hetero_render_unbiased():
    """Round-2: guided distance sampling in HETEROGENEOUS media (grid
    optical depth + ratio-tracked transmittance weights) matches the
    delta-tracking render in expectation (VERDICT item 6)."""
    from mitsuba_path_guiding_tpu.integrators.progressive import (
        ProgressiveConfig,
        ProgressiveRenderer,
    )
    from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import heterogeneous_box

    scene = build_scene(heterogeneous_box(sigma_s=0.9, sigma_a=0.1, g=0.0, res=16))
    ref = np.asarray(
        render(scene, RenderConfig(width=12, height=12, spp=384, max_depth=6, seed=42))
    )
    r = RenderConfig(width=12, height=12, spp=32, max_depth=6, seed=7)

    def run(gd):
        cfg = ProgressiveConfig(
            render=r, samples_per_progression=8, n_progressions=4,
            guiding=True, grid_res=4, n_lobes=4, guide_distance=gd,
        )
        ren = ProgressiveRenderer(scene, cfg)
        return np.asarray(ren.render())

    img_g = run(True)
    img_a = run(False)
    assert np.isfinite(img_g).all()
    # the isolation that matters: guided == unguided in expectation
    np.testing.assert_allclose(img_g.mean(), img_a.mean(), rtol=0.10)
    np.testing.assert_allclose(img_g.mean(), ref.mean(), rtol=0.2)
    np.testing.assert_allclose(img_a.mean(), ref.mean(), rtol=0.2)


def test_hetero_estimator_expectations():
    """The guided hetero collision estimator is unbiased against the
    delta tracker for both event classes: E[medium weights] estimates
    the same integral sigma_s*Tr, E[surface weights] estimates Tr(t_surf)."""
    from mitsuba_path_guiding_tpu.core import rng
    from mitsuba_path_guiding_tpu.guiding.distance import (
        guided_distance_weights_hetero,
    )
    from mitsuba_path_guiding_tpu.models.medium import (
        _track_keys,
        density_at,
        sample_free_flight,
        transmittance_ratio,
    )
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import heterogeneous_box

    scene = build_scene(heterogeneous_box(sigma_s=0.9, sigma_a=0.1, res=16))
    med = scene.medium
    n = 120_000
    o = jnp.tile(jnp.asarray([[0.0, 1.0, -1.8]]), (n, 1))
    dv = np.array([0.05, 0.02, 1.0])
    d = jnp.tile(jnp.asarray(dv / np.linalg.norm(dv))[None], (n, 1)).astype(jnp.float32)
    t_surf = jnp.full((n,), 3.6)
    rk = rng.ray_keys(rng.base_key(0), jnp.zeros((n,), jnp.int32), jnp.arange(n))

    tkd = _track_keys(rk, 0, 31)
    _, is_m, w_ff = sample_free_flight(med, o, d, t_surf, tkd)
    est_trk = float(jnp.mean(jnp.where(is_m[..., None], w_ff, 0.0)[:, 0]))

    g = make_grid(scene.aabb_min, scene.aabb_max, res=4, n_lobes=4)
    flux = jnp.ones((g.s_w.shape[0],))
    w_seg, dt_seg, tot, tr_end = guided_distance_weights_hetero(
        g, flux, med, o, d, t_surf
    )
    u1 = jax.random.uniform(jax.random.PRNGKey(1), (n,))
    u2 = jax.random.uniform(jax.random.PRNGKey(2), (n,))
    p_surf = jnp.clip(tr_end, 0.05, 0.95)
    go_surf = u2 < p_surf
    t_g = piecewise_sample(w_seg, dt_seg, tot, u1)
    pdf_c = piecewise_pdf(w_seg, dt_seg, tot, t_g)
    tk2 = _track_keys(rk, 0, 77)
    tr_hat = transmittance_ratio(med, o, d, jnp.where(go_surf, t_surf, t_g), tk2)
    ss = density_at(med, o + t_g[:, None] * d)[:, None] * med.sigma_s
    w_med = ss * tr_hat / jnp.maximum(((1 - p_surf) * pdf_c)[..., None], 1e-30)
    est_g = float(jnp.mean(jnp.where(~go_surf[..., None], w_med, 0.0)[:, 0]))
    np.testing.assert_allclose(est_g, est_trk, rtol=0.03)

    w_srf = tr_hat / p_surf[..., None]
    est_srf = float(jnp.mean(jnp.where(go_surf[..., None], w_srf, 0.0)[:, 0]))
    tk3 = _track_keys(rk, 0, 99)
    tr_ref = float(jnp.mean(transmittance_ratio(med, o, d, t_surf, tk3)[:, 0]))
    np.testing.assert_allclose(est_srf, tr_ref, rtol=0.03)
