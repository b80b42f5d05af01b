"""Irradiance cache meta-integrator (reference misc/irrcache.cpp +
irrcache.h): cache build sanity + image agreement with the path tracer
on the all-diffuse Cornell box (interpolation bias tolerated)."""
import numpy as np
import pytest

from mitsuba_path_guiding_tpu.integrators.irrcache import (
    build_irradiance_cache,
    interpolate_irradiance,
    render_irrcache,
)
from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box


@pytest.fixture(scope="module")
def cornell():
    return build_scene(cornell_box())


def test_cache_build(cornell):
    cfg = RenderConfig(width=8, height=8, spp=1, max_depth=4, seed=2)
    cache = build_irradiance_cache(cornell, cfg, n_records=256, rays_per_record=32)
    E = np.asarray(cache.E)
    ok = np.asarray(cache.valid)
    assert ok.sum() > 100  # border rays legitimately miss the open box
    assert np.isfinite(E).all() and (E >= 0).all()
    assert E[ok].mean() > 1e-3          # the box has indirect light
    R = np.asarray(cache.R_harm)[ok]
    assert (R > 0).all() and R.mean() < 10.0
    # interpolation at the record points reproduces the records closely
    Ei = np.asarray(
        interpolate_irradiance(cache, cache.pos, cache.normal, max_error=0.3)
    )
    rel = np.abs(Ei[ok] - E[ok]).sum(-1) / np.maximum(E[ok].sum(-1), 1e-6)
    assert np.median(rel) < 0.5  # neighbors pull the estimate, bias bounded


def test_irrcache_matches_pt(cornell):
    img_pt = np.asarray(
        render(cornell, RenderConfig(width=16, height=16, spp=192, max_depth=4, seed=3))
    )
    img_ic = np.asarray(
        render_irrcache(
            cornell,
            RenderConfig(width=16, height=16, spp=8, max_depth=4, seed=5),
            n_records=512, rays_per_record=64,
        )
    )
    assert np.isfinite(img_ic).all()
    ratio = img_ic.mean() / img_pt.mean()
    assert 0.8 < ratio < 1.2, ratio


def _record_E_at(scene, pts, ns, cfg, rays=4096, seed=91):
    """High-sample brute-force indirect irradiance at given points (the
    oracle the gradient predictions are checked against)."""
    import jax.numpy as jnp

    from mitsuba_path_guiding_tpu.core import rng
    from mitsuba_path_guiding_tpu.core.math import Frame
    from mitsuba_path_guiding_tpu.core.rng import event_uniform
    from mitsuba_path_guiding_tpu.core.warp import square_to_cosine_hemisphere
    from mitsuba_path_guiding_tpu.integrators.path import _offset_ray, trace

    n = pts.shape[0]
    rpos = jnp.repeat(jnp.asarray(pts, jnp.float32), rays, axis=0)
    rns = jnp.repeat(jnp.asarray(ns, jnp.float32), rays, axis=0)
    lane = jnp.arange(n * rays, dtype=jnp.int32)
    rk = rng.ray_keys(rng.base_key(seed), lane, jnp.zeros_like(lane))
    u = event_uniform(rk, 3 << 20, 2)
    d = Frame.from_normal(rns).to_world(square_to_cosine_hemisphere(u))
    L, aux, _ = trace(scene, _offset_ray(rpos, rns, d), d, rk,
                      max_depth=2, use_nee=True, use_bvh=False)
    L_ind = L - aux.first_le
    return np.pi * np.asarray(L_ind).reshape(n, rays, 3).mean(axis=1)


def _smooth_indirect_scene():
    """Floor + bright diffuse wall lit by a point light: the floor's
    indirect irradiance (one bounce off the wall) is a SMOOTH field —
    no occluders, so finite differences measure the true gradient
    (Cornell's interior boxes put occlusion steps inside the stencil)."""
    from mitsuba_path_guiding_tpu.scene.transforms import (
        look_at,
        rotate,
        scale,
        translate,
    )

    return build_scene({
        "sensor": {"type": "perspective", "fov": 60,
                   "to_world": look_at([0, 2.0, -3.5], [0, 0, 0])},
        "shapes": [
            {"type": "rectangle", "to_world": rotate([1, 0, 0], -90) @ scale(3.0),
             "bsdf": {"type": "diffuse", "reflectance": [0.6] * 3}},
            # wall at z=+2 facing the floor (-z)
            {"type": "rectangle",
             "to_world": translate(0.0, 1.5, 2.0) @ rotate([1, 0, 0], 180)
             @ scale(3.0),
             "bsdf": {"type": "diffuse", "reflectance": [0.9] * 3}},
        ],
        "emitters": [{"type": "point", "position": [0.5, 1.0, -1.5],
                      "intensity": [30.0] * 3}],
    })


def test_gradients_predict_directional_derivative():
    """The Ward-Heckbert translational gradient must match the numeric
    directional derivative of the indirect irradiance field on a smooth
    (occluder-free) floor (pins formulas AND sign conventions;
    reference irrcache.h:24-190 transGradient)."""
    scene = _smooth_indirect_scene()
    cfg = RenderConfig(width=8, height=8, spp=1, max_depth=4, seed=2)
    cache = build_irradiance_cache(scene, cfg, n_records=256,
                                   rays_per_record=256)
    pos = np.asarray(cache.pos)
    nrm = np.asarray(cache.normal)
    ok = np.asarray(cache.valid)
    floor = ok & (nrm[:, 1] > 0.99) & (np.abs(pos[:, 0]) < 1.0) \
        & (np.abs(pos[:, 2]) < 1.0) & (pos[:, 1] < 0.01)
    idx = np.where(floor)[0][:6]
    assert idx.size >= 3
    h = 0.15
    checked = 0
    for i in idx:
        g = np.asarray(cache.grad_t)[i]       # (3 axis, 3 chan)
        for tang in ([1.0, 0.0, 0.0], [0.0, 0.0, 1.0]):
            t = np.asarray(tang)
            pts = np.stack([pos[i] + h * t, pos[i] - h * t])
            nss = np.stack([nrm[i], nrm[i]])
            Epm = _record_E_at(scene, pts, nss, cfg, rays=16384)
            dnum = (Epm[0] - Epm[1]).mean() / (2 * h)
            dpred = (t @ g).mean()
            # MC noise + finite h: demand same sign and 3x magnitude band
            # whenever the derivative is non-negligible
            if abs(dnum) > 0.1:
                checked += 1
                assert np.sign(dnum) == np.sign(dpred), (i, tang, dnum, dpred)
                assert 0.3 < abs(dpred) / abs(dnum) < 3.0, (i, tang, dnum, dpred)
    assert checked >= 2, "field too flat to exercise the gradient"


def test_gradient_interpolation_beats_ward_only(cornell):
    """VERDICT r3 item 7: gradient extrapolation must measurably reduce
    interpolation error against brute-force indirect irradiance at
    off-record points on the smooth-indirect Cornell floor."""
    cfg = RenderConfig(width=8, height=8, spp=1, max_depth=4, seed=2)
    cache = build_irradiance_cache(cornell, cfg, n_records=256,
                                   rays_per_record=128)
    rng_ = np.random.default_rng(5)
    n = 24
    pts = np.stack([rng_.uniform(-0.7, 0.7, n),
                    np.zeros(n),
                    rng_.uniform(-0.7, 0.7, n)], axis=-1).astype(np.float32)
    ns = np.broadcast_to(np.array([0.0, 1.0, 0.0], np.float32), (n, 3))
    ref = _record_E_at(cornell, pts, ns, cfg, rays=8192)
    e_g = np.asarray(interpolate_irradiance(
        cache, pts, ns, max_error=0.4, use_gradients=True))
    e_w = np.asarray(interpolate_irradiance(
        cache, pts, ns, max_error=0.4, use_gradients=False))
    err_g = np.abs(e_g - ref).mean()
    err_w = np.abs(e_w - ref).mean()
    assert err_g < err_w, (err_g, err_w)
