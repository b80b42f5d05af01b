"""SPPM tests: photon transport vs analytic irradiance, grid gather vs
brute force, and full-render agreement with the path tracer (reference
sppm.cpp / photonmap kNN strategy; SURVEY.md §4 cross-consistency)."""
import jax.numpy as jnp
import numpy as np

from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.integrators.sppm import gather, photon_pass, render_sppm
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box
from mitsuba_path_guiding_tpu.scene.transforms import look_at, rotate, scale


def _floor_point_scene():
    return build_scene({
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": look_at([0, 2, -4], [0, 0, 0])},
        "shapes": [{"type": "rectangle",
                    "to_world": rotate([1, 0, 0], -90) @ scale(2.0),
                    "bsdf": {"type": "diffuse", "reflectance": [0.6] * 3}}],
        "emitters": [{"type": "point", "position": [0, 2.5, 0],
                      "intensity": [8.0] * 3}],
    })


def test_photon_density_matches_analytic():
    """Photon flux density on the floor equals the point light's
    irradiance I cos/d^2 (brute-force disc count, no grid)."""
    scene = _floor_point_scene()
    n = 1 << 16
    rk = rng.ray_keys(rng.base_key(0), jnp.arange(n, dtype=jnp.int32),
                      jnp.zeros(n, jnp.int32))
    pos, wi, pw, ok, _caustic = photon_pass(scene, rk, max_depth=1, use_bvh=False)
    pos, pw, ok = np.asarray(pos), np.asarray(pw), np.asarray(ok)
    r = 0.3
    sel = ok & (pos[:, 0] ** 2 + pos[:, 2] ** 2 <= r * r) & (np.abs(pos[:, 1]) < 1e-3)
    E = pw[sel].sum(axis=0)[0] / n / (np.pi * r * r)
    np.testing.assert_allclose(E, 8.0 / 2.5**2, rtol=0.08)


def test_grid_gather_matches_brute():
    scene = _floor_point_scene()
    n = 1 << 15
    rk = rng.ray_keys(rng.base_key(3), jnp.arange(n, dtype=jnp.int32),
                      jnp.zeros(n, jnp.int32))
    pos, wi, pw, ok, _caustic = photon_pass(scene, rk, max_depth=2, use_bvh=False)
    r = 0.25
    hps = jnp.asarray([[0.0, 0.0, 0.0], [0.7, 0.0, -0.4], [1.9, 0.0, 1.9]], jnp.float32)
    ns = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (3, 3))
    lo = scene.aabb_min
    extent = float(jnp.max(scene.aabb_max - scene.aabb_min))
    cell = 2 * r
    G = min(int(np.ceil(extent / cell)) + 1, 512)
    cnt, phi, _pp = gather(hps, ns, jnp.full((3,), r), pos, wi, pw, ok, lo, 1.0 / cell, G)
    posn, pwn, okn = np.asarray(pos), np.asarray(pw), np.asarray(ok)
    for i, hp in enumerate(np.asarray(hps)):
        d2 = ((posn - hp) ** 2).sum(-1)
        planar = np.abs(posn[:, 1] - hp[1]) <= 0.1 * r
        sel = okn & (d2 <= r * r) & planar
        # subsample reweighting is unbiased but noisy for dense cells
        np.testing.assert_allclose(float(cnt[i]), sel.sum(), rtol=0.35, atol=3.0)


def test_sppm_matches_forward_direct():
    scene = _floor_point_scene()
    f = np.asarray(render(scene, RenderConfig(width=24, height=24, spp=64, max_depth=2, seed=1)))
    s = np.asarray(render_sppm(scene, RenderConfig(width=24, height=24, spp=1, max_depth=2, seed=1),
                               n_iterations=5, photons_per_iter=1 << 15))
    assert np.isfinite(s).all()
    np.testing.assert_allclose(s.mean(), f.mean(), rtol=0.08)


def test_sppm_matches_forward_cornell():
    scene = build_scene(cornell_box())
    f = np.asarray(render(scene, RenderConfig(width=24, height=24, spp=96, max_depth=5, seed=0)))
    s = np.asarray(render_sppm(scene, RenderConfig(width=24, height=24, spp=1, max_depth=5, seed=0),
                               n_iterations=6, photons_per_iter=1 << 15))
    np.testing.assert_allclose(s.mean(), f.mean(), rtol=0.12)
    corr = np.corrcoef(f.mean(-1).ravel(), s.mean(-1).ravel())[0, 1]
    assert corr > 0.95, corr


def test_sppm_glossy_gather_matches_forward():
    """Glossy (rough-conductor) surfaces must gather through the full
    BSDF, not a diffuse proxy (sppm.cpp:414 bsdf->eval; direction-binned
    gather in integrators/sppm.py)."""
    desc = cornell_box()
    # make the floor glossy: lobe-dependent gather is now load-bearing
    desc["shapes"][0]["bsdf"] = {
        "type": "roughconductor", "alpha": 0.25, "material": "none",
        "specular_reflectance": [0.9, 0.9, 0.9],
    }
    scene = build_scene(desc)
    f = np.asarray(render(scene, RenderConfig(width=24, height=24, spp=128, max_depth=4, seed=0)))
    s = np.asarray(render_sppm(scene, RenderConfig(width=24, height=24, spp=1, max_depth=4, seed=0),
                               n_iterations=6, photons_per_iter=1 << 15))
    assert np.isfinite(s).all()
    # direction-binned lobe evaluation: means agree, image correlates
    np.testing.assert_allclose(s.mean(), f.mean(), rtol=0.2)
    corr = np.corrcoef(f.mean(-1).ravel(), s.mean(-1).ravel())[0, 1]
    assert corr > 0.9, corr


def test_sppm_narrow_glossy_per_photon_eval():
    """Low-roughness gather (alpha far below the direction-bin
    resolution) must converge to the path-traced reference via the
    per-photon eval route (VERDICT r3 item 8; reference sppm.cpp:414
    evaluates bsdf->eval per photon — no continue-as-specular dodge)."""
    desc = cornell_box()
    desc["shapes"][0]["bsdf"] = {
        "type": "roughconductor", "alpha": 0.06, "material": "none",
        "specular_reflectance": [0.9, 0.9, 0.9],
    }
    scene = build_scene(desc)
    f = np.asarray(render(scene, RenderConfig(width=24, height=24, spp=192, max_depth=4, seed=0)))
    s = np.asarray(render_sppm(scene, RenderConfig(width=24, height=24, spp=1, max_depth=4, seed=0),
                               n_iterations=8, photons_per_iter=1 << 15))
    assert np.isfinite(s).all()
    np.testing.assert_allclose(s.mean(), f.mean(), rtol=0.2)
    corr = np.corrcoef(f.mean(-1).ravel(), s.mean(-1).ravel())[0, 1]
    assert corr > 0.9, corr
