"""Preetham sky/sun emitter tests (reference sky.cpp/sun.cpp/sunsky.cpp —
model substituted with the analytic Preetham fit; see models/sunsky.py)."""
import numpy as np

from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.models.sunsky import (
    hosek_sky_image,
    preetham_sky_image,
    preetham_sun_irradiance,
    sun_direction_from_angles,
)
from mitsuba_path_guiding_tpu.scene.builder import build_scene


def test_sky_image_properties():
    sd = sun_direction_from_angles(35.0, 40.0)
    img = preetham_sky_image(sd, turbidity=3.0, resolution=64)
    assert img.shape == (64, 128, 3)
    assert np.isfinite(img).all() and (img >= 0).all()
    # brightest texel should be near the sun direction
    H, W = img.shape[:2]
    lum = img.mean(-1)
    iy, ix = np.unravel_index(np.argmax(lum), lum.shape)
    th = (iy + 0.5) / H * np.pi
    ph = ((ix + 0.5) / W - 0.5) * 2 * np.pi
    d = np.array([np.sin(th) * np.sin(ph), np.cos(th), -np.sin(th) * np.cos(ph)])
    assert d @ sd > 0.95, d @ sd
    # higher turbidity -> hazier (flatter) sky: max/mean ratio drops
    img7 = preetham_sky_image(sd, turbidity=7.0, resolution=64)
    r3 = lum.max() / lum.mean()
    r7 = (img7.mean(-1)).max() / (img7.mean(-1)).mean()
    assert r7 < r3


def test_hosek_sky_properties():
    sd = sun_direction_from_angles(35.0, 40.0)
    img = hosek_sky_image(sd, turbidity=3.0, resolution=64)
    assert img.shape == (64, 128, 3)
    assert np.isfinite(img).all() and (img >= 0).all()
    # brightest texel near the sun (the model's forward-scattering peak)
    H, W = img.shape[:2]
    lum = img.mean(-1)
    iy, ix = np.unravel_index(np.argmax(lum), lum.shape)
    th = (iy + 0.5) / H * np.pi
    ph = ((ix + 0.5) / W - 0.5) * 2 * np.pi
    d = np.array([np.sin(th) * np.sin(ph), np.cos(th), -np.sin(th) * np.cos(ph)])
    assert d @ sd > 0.85, d @ sd
    # clear sky is blue at the zenith patch away from the sun
    zen = img[2, 3 * W // 4]
    assert zen[2] > zen[0], zen
    # hazier sky concentrates radiance in the circumsolar region (Mie
    # forward peak grows with turbidity in the Hosek model)
    img7 = hosek_sky_image(sd, turbidity=7.0, resolution=64)
    assert img7.mean(-1).max() / img7.mean(-1).mean() > lum.max() / lum.mean()
    # same default range as Preetham (shared `scale` semantics in builder)
    pre = preetham_sky_image(sd, turbidity=3.0, resolution=64)
    assert 0.2 < img.mean() / pre.mean() < 5.0


def test_sun_irradiance_behavior():
    hi = preetham_sun_irradiance(sun_direction_from_angles(60.0), 2.0)
    lo = preetham_sun_irradiance(sun_direction_from_angles(5.0), 2.0)
    assert (hi > lo).all()  # extinction grows near the horizon
    hazy = preetham_sun_irradiance(sun_direction_from_angles(60.0), 8.0)
    assert (hazy < hi).all()
    below = preetham_sun_irradiance(-sun_direction_from_angles(30.0), 3.0)
    assert (below == 0).all()
    # low sun is redder: R/B grows as elevation falls
    assert lo[0] / max(lo[2], 1e-9) > hi[0] / max(hi[2], 1e-9)


def _sunsky_scene(etype):
    return {
        "sensor": {"type": "perspective", "fov": 60.0},
        "shapes": [
            {"type": "rectangle", "bsdf": {"type": "diffuse"}},
        ],
        "emitters": [
            # azimuth 180 puts the sun on the camera's side of the plane
            {"type": etype, "elevation": 35.0, "azimuth": 180.0, "turbidity": 3.0}
        ],
    }


def test_sunsky_scene_renders():
    for etype in ("sky", "sun", "sunsky"):
        scene = build_scene(_sunsky_scene(etype))
        img = np.asarray(
            render(scene, RenderConfig(width=16, height=16, spp=4, max_depth=3))
        )
        assert np.isfinite(img).all(), etype
        assert img.mean() > 0, etype
