"""New sensor kinds (telecentric, rdist, measurement probes) + the
collimated emitter.

Validation style per SURVEY.md §4: analytic closed forms where they exist
(a constant-radiance environment gives E = pi*L, fluence = 4pi*L, and a
radiancemeter reads L exactly)."""
import numpy as np
import pytest

from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import look_at


def _meter_scene(stype):
    # a probe floating in a constant-radiance environment; the far-away
    # sphere never blocks the probe
    return {
        "sensor": {"type": stype, "to_world": look_at([0, 0, 0], [0, 0, 1])},
        "shapes": [
            {
                "type": "sphere",
                "center": [0, 100, 0],
                "radius": 0.5,
                "bsdf": {"type": "diffuse", "reflectance": [0.5] * 3},
            }
        ],
        "emitters": [{"type": "constant", "radiance": [2.0, 2.0, 2.0]}],
    }


@pytest.mark.parametrize(
    "stype,expect",
    [
        ("radiancemeter", 2.0),            # reads L directly
        ("irradiancemeter", np.pi * 2.0),  # E = pi L for constant L
        ("fluencemeter", 4.0 * np.pi * 2.0),  # fluence = 4pi L
    ],
)
def test_measurement_sensors_constant_env(stype, expect):
    scene = build_scene(_meter_scene(stype))
    img = np.asarray(
        render(scene, RenderConfig(width=4, height=4, spp=64, max_depth=2, seed=1))
    )
    assert np.isfinite(img).all()
    assert abs(img.mean() / expect - 1.0) < 0.05, (stype, img.mean(), expect)


def test_telecentric_rays_parallel_at_zero_aperture():
    from mitsuba_path_guiding_tpu.models.sensor import generate_rays
    from mitsuba_path_guiding_tpu.scene.types import SensorKind

    sc = _meter_scene("telecentric")
    sc["sensor"]["ortho_width"] = 1.5
    scene = build_scene(sc)
    import jax.numpy as jnp

    pix = jnp.arange(16, dtype=jnp.int32)
    u = jnp.full((16, 2), 0.5)
    o, d, _ = generate_rays(
        scene.sensor, 4, 4, pix, u, kind=SensorKind.TELECENTRIC
    )
    d = np.asarray(d)
    # pinhole (aperture 0): every ray parallel to the camera forward axis
    assert np.abs(d - d[0]).max() < 1e-5
    o = np.asarray(o)
    assert np.abs(o - o.mean(0)).max() > 0.1  # origins spread over the film


def test_rdist_bends_off_axis_rays():
    from mitsuba_path_guiding_tpu.models.sensor import generate_rays
    from mitsuba_path_guiding_tpu.scene.types import Sensor, SensorKind
    import jax.numpy as jnp

    base = dict(
        to_world=jnp.eye(4),
        tan_half_fov_x=jnp.float32(0.5),
        tan_half_fov_y=jnp.float32(0.5),
        aperture_radius=jnp.float32(0.0),
        focus_distance=jnp.float32(1.0),
        near_clip=jnp.float32(1e-3),
        kind=jnp.int32(SensorKind.PERSPECTIVE),
    )
    s0 = Sensor(**base)
    s1 = Sensor(**base, kc=jnp.asarray([0.2, 0.0], jnp.float32))
    pix = jnp.arange(16, dtype=jnp.int32)
    u = jnp.full((16, 2), 0.5)
    _, d0, _ = generate_rays(s0, 4, 4, pix, u)
    _, d1, _ = generate_rays(s1, 4, 4, pix, u)
    d0, d1 = np.asarray(d0), np.asarray(d1)
    # center pixels barely change; corner pixels bend outward (kc0 > 0)
    corner = 0
    assert not np.allclose(d0[corner], d1[corner], atol=1e-4)
    assert abs(np.dot(d0[corner], d1[corner])) < 1.0


def test_collimated_emitter_lights_floor_via_ptracer():
    from mitsuba_path_guiding_tpu.integrators.ptracer import render_ptracer
    from mitsuba_path_guiding_tpu.models.emitter import sample_ray, kinds_present
    import jax.numpy as jnp

    sc = {
        "sensor": {
            "type": "perspective",
            "fov": 60.0,
            "to_world": look_at([0, 2.0, -3.0], [0, 0, 0]),
        },
        "shapes": [
            {
                "type": "rectangle",  # floor at y=0 (+y normal after rot)
                "to_world": np.array(
                    [[2, 0, 0, 0], [0, 0, 2, 0], [0, -2, 0, 0], [0, 0, 0, 1.0]]
                ),
                "bsdf": {"type": "diffuse", "reflectance": [0.8, 0.8, 0.8]},
            }
        ],
        "emitters": [
            {
                "type": "collimated",
                "position": [0.0, 1.5, 0.0],
                "direction": [0.0, -1.0, 0.0],
                "power": [5.0, 5.0, 5.0],
            }
        ],
    }
    scene = build_scene(sc)
    assert kinds_present(scene.emitters) == (6,)
    # the delta beam emits its fixed ray with weight = power/pmf
    u = jnp.full((8, 5), 0.3)
    rs = sample_ray(scene.emitters, scene.aabb_min, scene.aabb_max, u)
    assert np.allclose(np.asarray(rs.o), [0.0, 1.5, 0.0], atol=1e-5)
    assert np.allclose(np.asarray(rs.d), [0.0, -1.0, 0.0], atol=1e-5)
    assert np.allclose(np.asarray(rs.weight), 5.0, atol=1e-4)
    img = np.asarray(
        render_ptracer(
            scene, RenderConfig(width=16, height=16, spp=32, max_depth=3, seed=2)
        )
    )
    assert np.isfinite(img).all()
    assert img.max() > 0.0  # the lit spot reaches the camera
    # NEE never samples a collimated emitter: forward PT sees only black
    img_pt = np.asarray(
        render(scene, RenderConfig(width=8, height=8, spp=4, max_depth=2, seed=2))
    )
    assert img_pt.max() == 0.0
