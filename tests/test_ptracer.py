"""Adjoint particle tracer tests: light-traced image must agree with the
forward path tracer in expectation (integrator cross-consistency, the
reference's bidirectional comparison strategy — SURVEY.md §4)."""
import numpy as np

from mitsuba_path_guiding_tpu.integrators.ptracer import render_ptracer
from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box
from mitsuba_path_guiding_tpu.scene.transforms import look_at, rotate, scale, translate


def test_ptracer_matches_forward_direct():
    """Direct lighting: floor + area light, depth 2."""
    desc = {
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": look_at([0, 2, -4], [0, 0, 0])},
        "shapes": [
            {"type": "rectangle", "to_world": rotate([1, 0, 0], -90) @ scale(2.0),
             "bsdf": {"type": "diffuse", "reflectance": [0.6] * 3}},
            {"type": "rectangle",
             "to_world": translate(0, 3, 0) @ rotate([1, 0, 0], 90) @ scale(0.4),
             "bsdf": {"type": "diffuse", "reflectance": [0, 0, 0]},
             "emitter": {"radiance": [30.0] * 3}},
        ],
        "emitters": [],
    }
    scene = build_scene(desc)
    f = np.asarray(render(scene, RenderConfig(width=24, height=24, spp=128, max_depth=2, seed=1)))
    l = np.asarray(render_ptracer(scene, RenderConfig(width=24, height=24, spp=128, max_depth=2, seed=1)))
    assert np.isfinite(l).all()
    np.testing.assert_allclose(l.mean(), f.mean(), rtol=0.05)


def test_ptracer_matches_forward_cornell():
    """Global illumination incl. directly visible emitter."""
    scene = build_scene(cornell_box())
    f = np.asarray(render(scene, RenderConfig(width=24, height=24, spp=160, max_depth=6, seed=0)))
    l = np.asarray(render_ptracer(scene, RenderConfig(width=24, height=24, spp=160, max_depth=6, seed=0)))
    np.testing.assert_allclose(l.mean(), f.mean(), rtol=0.08)
    fm, lm = f.mean(-1).ravel(), l.mean(-1).ravel()
    corr = np.corrcoef(fm, lm)[0, 1]
    assert corr > 0.97, corr


def test_ptracer_point_light():
    desc = {
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": look_at([0, 2, -4], [0, 0, 0])},
        "shapes": [
            {"type": "rectangle", "to_world": rotate([1, 0, 0], -90) @ scale(2.0),
             "bsdf": {"type": "diffuse", "reflectance": [0.6] * 3}},
        ],
        "emitters": [{"type": "point", "position": [0, 2.5, 0], "intensity": [8.0] * 3}],
    }
    scene = build_scene(desc)
    f = np.asarray(render(scene, RenderConfig(width=24, height=24, spp=64, max_depth=2, seed=2)))
    l = np.asarray(render_ptracer(scene, RenderConfig(width=24, height=24, spp=256, max_depth=2, seed=2)))
    np.testing.assert_allclose(l.mean(), f.mean(), rtol=0.06)


def test_pssmlt_matches_forward():
    """Kelemen PSSMLT agrees with the forward path tracer in expectation
    (reference pssmlt.cpp's design intent; chain parallelism P7)."""
    from mitsuba_path_guiding_tpu.integrators.pssmlt import render_pssmlt

    scene = build_scene(cornell_box())
    cfg = RenderConfig(width=24, height=24, spp=96, max_depth=4, seed=1)
    f = np.asarray(render(scene, RenderConfig(width=24, height=24, spp=96, max_depth=4, seed=0)))
    m = np.asarray(render_pssmlt(scene, cfg, n_chains=4096, bootstrap_factor=8))
    assert np.isfinite(m).all()
    # the MLT image mean carries the (heavy-tailed) normalization-constant
    # noise — 12% at these sample counts (measured over seeds)
    np.testing.assert_allclose(m.mean(), f.mean(), rtol=0.12)
    corr = np.corrcoef(f.mean(-1).ravel(), m.mean(-1).ravel())[0, 1]
    assert corr > 0.9, corr
