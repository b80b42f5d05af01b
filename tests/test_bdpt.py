"""BDPT consistency: bidirectional estimates must agree with the forward
path tracer in expectation (the reference validates bdpt the same way —
integrator-vs-integrator image agreement, SURVEY.md §4)."""
import numpy as np
import pytest

from mitsuba_path_guiding_tpu.integrators.bdpt import render_bdpt
from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box


@pytest.fixture(scope="module")
def cornell():
    return build_scene(cornell_box())


@pytest.fixture(scope="module")
def cornell_point():
    sc = cornell_box()
    sc["shapes"] = [s for s in sc["shapes"] if not s.get("emitter")]
    sc["emitters"] = [
        {"type": "point", "position": [0.0, 0.9, 0.0], "intensity": [1.0, 0.9, 0.7]}
    ]
    return build_scene(sc)


def test_bdpt_matches_pt_area_light(cornell):
    img_pt = np.asarray(
        render(cornell, RenderConfig(width=20, height=20, spp=256, max_depth=5, seed=3))
    )
    img_b = np.asarray(
        render_bdpt(cornell, RenderConfig(width=20, height=20, spp=96, max_depth=5, seed=5))
    )
    ratio = img_b.mean() / img_pt.mean()
    assert abs(ratio - 1.0) < 0.03, ratio
    rel = np.abs(img_b - img_pt).mean() / img_pt.mean()
    assert rel < 0.12, rel


def test_bdpt_matches_pt_point_light_depth2(cornell_point):
    # depth 2: s=1, t=1 and (a=2,b=1) are the complete strategy set for a
    # delta light — agreement here pins the VCM MIS bookkeeping exactly
    img_pt = np.asarray(
        render(cornell_point, RenderConfig(width=20, height=20, spp=192, max_depth=2, seed=3))
    )
    img_b = np.asarray(
        render_bdpt(cornell_point, RenderConfig(width=20, height=20, spp=96, max_depth=2, seed=5))
    )
    ratio = img_b.mean() / img_pt.mean()
    assert abs(ratio - 1.0) < 0.03, ratio


def test_bdpt_matches_pt_point_light_depth5(cornell_point):
    img_pt = np.asarray(
        render(cornell_point, RenderConfig(width=20, height=20, spp=192, max_depth=5, seed=3))
    )
    img_b = np.asarray(
        render_bdpt(cornell_point, RenderConfig(width=20, height=20, spp=96, max_depth=5, seed=5))
    )
    ratio = img_b.mean() / img_pt.mean()
    assert abs(ratio - 1.0) < 0.035, ratio


def test_bdpt_light_image_carries_energy(cornell):
    """The t=1 (light-tracing) strategies must contribute: disabling the
    light image loses the energy the MIS weights allocated to it."""
    cfg = RenderConfig(width=16, height=16, spp=64, max_depth=5, seed=7)
    full = np.asarray(render_bdpt(cornell, cfg)).mean()
    no_li = np.asarray(render_bdpt(cornell, cfg, light_image=False)).mean()
    assert no_li < full * 0.995


@pytest.fixture(scope="module")
def env_scene():
    """Open scene under a constant environment: a diffuse box on a floor
    (tests the round-2 infinite-emitter strategies, bdpt_proc.cpp)."""
    from mitsuba_path_guiding_tpu.scene.transforms import rotate, scale, translate

    white = {"type": "diffuse", "reflectance": [0.6, 0.6, 0.6]}
    return build_scene({
        "shapes": [
            {"type": "rectangle",
             "to_world": rotate([1, 0, 0], -90) @ scale(3.0), "bsdf": white},
            {"type": "cube",
             "to_world": translate(0, 0.5, 0) @ scale(0.5),
             "bsdf": {"type": "diffuse", "reflectance": [0.7, 0.3, 0.2]}},
        ],
        "emitters": [{"type": "constant", "radiance": [0.8, 0.9, 1.0]}],
        "sensor": {"type": "perspective", "fov": 50.0,
                   "to_world": __import__("mitsuba_path_guiding_tpu.scene.transforms",
                                          fromlist=["look_at"]).look_at(
                       [2.5, 2.0, -2.5], [0, 0.4, 0], [0, 1, 0])},
    })


@pytest.mark.slow
def test_bdpt_matches_pt_constant_env(env_scene):
    """Round-2: bdpt accepts env scenes (VERDICT item 5); full-strategy
    agreement with the path tracer under a constant environment."""
    img_pt = np.asarray(
        render(env_scene, RenderConfig(width=20, height=20, spp=192, max_depth=4, seed=3))
    )
    img_b = np.asarray(
        render_bdpt(env_scene, RenderConfig(width=20, height=20, spp=96, max_depth=4, seed=5))
    )
    ratio = img_b.mean() / img_pt.mean()
    assert abs(ratio - 1.0) < 0.04, ratio
    rel = np.abs(img_b - img_pt).mean() / img_pt.mean()
    assert rel < 0.15, rel


@pytest.mark.slow
def test_bdpt_matches_pt_envmap(env_scene):
    """Textured environment (importance-sampled lat-long)."""
    import jax.numpy as jnp

    from mitsuba_path_guiding_tpu.scene.transforms import rotate, scale

    rs = np.random.default_rng(3)
    img_env = (0.2 + rs.random((16, 32, 3)) ** 2 * 3.0).astype(np.float32)
    white = {"type": "diffuse", "reflectance": [0.6, 0.6, 0.6]}
    sc = build_scene({
        "shapes": [{"type": "rectangle",
                    "to_world": rotate([1, 0, 0], -90) @ scale(3.0),
                    "bsdf": white}],
        "emitters": [{"type": "envmap", "image": img_env}],
        "sensor": {"type": "perspective", "fov": 50.0,
                   "to_world": __import__("mitsuba_path_guiding_tpu.scene.transforms",
                                          fromlist=["look_at"]).look_at(
                       [2.5, 2.0, -2.5], [0, 0.2, 0], [0, 1, 0])},
    })
    img_pt = np.asarray(
        render(sc, RenderConfig(width=16, height=16, spp=192, max_depth=3, seed=3))
    )
    img_b = np.asarray(
        render_bdpt(sc, RenderConfig(width=16, height=16, spp=96, max_depth=3, seed=5))
    )
    ratio = img_b.mean() / img_pt.mean()
    assert abs(ratio - 1.0) < 0.05, ratio


@pytest.fixture(scope="module")
def cornell_directional():
    sc = cornell_box()
    sc["shapes"] = [s for s in sc["shapes"] if not s.get("emitter")]
    sc["emitters"] = [
        {"type": "directional", "direction": [0.3, -1.0, 0.2],
         "irradiance": [1.0, 0.9, 0.7]}
    ]
    return build_scene(sc)


def test_bdpt_matches_pt_directional_light(cornell_directional):
    # delta-infinite emitter (reference bdpt_proc.cpp:63+): light-subpath
    # strategies + delta NEE must agree with the forward path tracer
    img_pt = np.asarray(
        render(cornell_directional,
               RenderConfig(width=20, height=20, spp=192, max_depth=3, seed=3))
    )
    img_b = np.asarray(
        render_bdpt(cornell_directional,
                    RenderConfig(width=20, height=20, spp=96, max_depth=3, seed=5))
    )
    ratio = img_b.mean() / img_pt.mean()
    assert abs(ratio - 1.0) < 0.05, ratio
    rel = np.abs(img_b - img_pt).mean() / img_pt.mean()
    assert rel < 0.15, rel


def test_bdpt_collimated_traces(cornell_directional):
    # collimated: delta position AND direction — only light-subpath
    # strategies exist; the render must be finite and carry energy from
    # the beam's bounce (reference collimated.cpp)
    sc = cornell_box()
    sc["shapes"] = [s for s in sc["shapes"] if not s.get("emitter")]
    sc["emitters"] = [
        {"type": "collimated", "position": [0.0, 0.95, 0.0],
         "direction": [0.0, -1.0, 0.0], "power": [3.0, 3.0, 3.0]}
    ]
    scn = build_scene(sc)
    img = np.asarray(
        render_bdpt(scn, RenderConfig(width=20, height=20, spp=64, max_depth=4, seed=2))
    )
    assert np.isfinite(img).all()
    assert img.mean() > 1e-4, img.mean()
