"""Dipole BSSRDF (reference src/subsurface/dipole.cpp): kernel properties
+ an e2e translucency render (light bleeding through a thin slab)."""
import jax.numpy as jnp
import numpy as np

from mitsuba_path_guiding_tpu.integrators.render import RenderConfig
from mitsuba_path_guiding_tpu.integrators.subsurface import (
    SSSamples,
    compute_irradiance,
    dipole_mo,
    render_subsurface,
    sample_surface_points,
)
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import look_at
from mitsuba_path_guiding_tpu.scene.transforms import translate


def test_dipole_kernel_decays():
    row = jnp.asarray(
        [0.01, 0.01, 0.01, 1.0, 1.0, 1.0, 1.5, 1.0] + [0.0] * 8, jnp.float32
    )
    samples = SSSamples(
        pos=jnp.asarray([[0.0, 0.0, 0.0]]),
        normal=jnp.asarray([[0.0, 0.0, 1.0]]),
        E=jnp.ones((1, 3)),
        area=jnp.ones((1,)),
        sid=jnp.zeros((1,), jnp.int32),
    )
    xs = jnp.stack(
        [jnp.linspace(0.0, 3.0, 16), jnp.zeros(16), jnp.zeros(16)], axis=-1
    )
    mo = np.asarray(dipole_mo(row, xs, samples))
    assert np.isfinite(mo).all() and (mo >= 0).all()
    # monotone decay with distance, strictly positive near the source
    assert (np.diff(mo[:, 0]) <= 1e-9).all()
    assert mo[0, 0] > mo[-1, 0] * 10


def _slab_scene():
    # thin translucent slab between a point light (behind) and the camera
    return {
        "sensor": {"type": "perspective", "fov": 50.0,
                   "to_world": look_at([0, 0, -3], [0, 0, 0])},
        "shapes": [
            {"type": "cube",
             "to_world": translate(0, 0, 0) @ np.diag([1.0, 1.0, 0.12, 1.0]),
             "bsdf": {"type": "diffuse", "reflectance": [0.0] * 3},
             "subsurface": {"sigma_a": [0.02, 0.04, 0.1],
                            "sigma_s": [1.2, 1.0, 0.8], "eta": 1.3}},
        ],
        "emitters": [
            {"type": "point", "position": [0.0, 0.0, 1.5],
             "intensity": [8.0, 8.0, 8.0]},
        ],
    }


def test_translucent_slab_glows():
    scene = build_scene(_slab_scene())
    assert scene.sss_packed is not None and scene.sss_packed.shape[0] == 1
    pts = sample_surface_points(scene, 512, seed=1)
    assert np.asarray(pts.area).sum() > 0
    cfg = RenderConfig(width=16, height=16, spp=2, max_depth=2, seed=3)
    pts = compute_irradiance(scene, pts, cfg)
    E = np.asarray(pts.E)
    assert np.isfinite(E).all() and E.max() > 0  # the back side is lit
    img = np.asarray(render_subsurface(scene, cfg, n_points=512))
    assert np.isfinite(img).all()
    # the camera-facing side receives NO direct light (black lambertian,
    # light behind) — any signal is diffusion through the slab
    assert img.mean() > 1e-4, img.mean()
    # thicker absorption kills the glow
    sc2 = _slab_scene()
    sc2["shapes"][0]["subsurface"]["sigma_a"] = [5.0, 5.0, 5.0]
    img2 = np.asarray(render_subsurface(build_scene(sc2), cfg, n_points=512))
    assert img2.mean() < img.mean() * 0.5, (img.mean(), img2.mean())


def _single_scatter_scene(g=0.0):
    # scattering sphere lit from the side; camera sees in-scattered glow
    return {
        "sensor": {"type": "perspective", "fov": 50.0,
                   "to_world": look_at([0, 0, -3], [0, 0, 0])},
        "shapes": [
            {"type": "sphere",
             "to_world": np.diag([0.8, 0.8, 0.8, 1.0]),
             "bsdf": {"type": "diffuse", "reflectance": [0.0] * 3},
             "subsurface": {"type": "singlescatter",
                            "sigma_a": [0.05, 0.05, 0.05],
                            "sigma_s": [0.8, 0.8, 0.8], "eta": 1.33, "g": g}},
        ],
        "emitters": [
            {"type": "point", "position": [2.5, 0.0, 0.0],
             "intensity": [30.0, 30.0, 30.0]},
        ],
    }


def test_singlescatter_renders_and_scales_with_sigma_s():
    """singlescatter.cpp analogue: the in-scattered glow is finite,
    positive, and grows with the scattering coefficient."""
    scene = build_scene(_single_scatter_scene())
    img = np.asarray(render_subsurface(scene, RenderConfig(width=24, height=24, spp=4, seed=0)))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-4, img.mean()

    weak = _single_scatter_scene()
    weak["shapes"][0]["subsurface"]["sigma_s"] = [0.1, 0.1, 0.1]
    img_w = np.asarray(render_subsurface(build_scene(weak), RenderConfig(width=24, height=24, spp=4, seed=0)))
    assert img.mean() > 1.5 * img_w.mean(), (img.mean(), img_w.mean())


def test_singlescatter_phase_anisotropy():
    """Forward-scattering phase (g>0) changes the image (phase is wired)."""
    a = np.asarray(render_subsurface(build_scene(_single_scatter_scene(0.0)),
                                     RenderConfig(width=16, height=16, spp=4, seed=0)))
    b = np.asarray(render_subsurface(build_scene(_single_scatter_scene(0.8)),
                                     RenderConfig(width=16, height=16, spp=4, seed=0)))
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-9) > 0.02
