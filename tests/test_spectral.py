"""N-bin spectral support + dispersive rendering (reference spectrum.h
SPECTRUM_SAMPLES mode, spectrum.cpp CIE/blackbody/InterpolatedSpectrum)."""
import numpy as np

from mitsuba_path_guiding_tpu.core import spectral as S


def test_cie_roundtrip_flat_spectrum_is_whiteish():
    flat = np.ones(16)
    rgb = S.spectrum_to_rgb(flat, 16)
    assert rgb.min() > 0
    assert rgb.max() / rgb.min() < 1.6  # equal-energy ~ white


def test_rgb_upsample_roundtrip():
    for rgb in ([0.8, 0.2, 0.1], [0.2, 0.7, 0.3], [0.5, 0.5, 0.5]):
        spec = S.rgb_to_spectrum(np.asarray(rgb), 24)
        assert (spec >= 0).all()
        back = S.spectrum_to_rgb(spec, 24)
        np.testing.assert_allclose(back, rgb, atol=0.02)


def test_blackbody_locus():
    # hot = blue-ish, warm = red-ish
    hot = S.spectrum_to_rgb(S.blackbody(10000.0, 32), 32)
    warm = S.spectrum_to_rgb(S.blackbody(2500.0, 32), 32)
    assert hot[2] / hot[0] > 1.0
    assert warm[0] / warm[2] > 2.0
    # normalized: unit luminance
    y = S.spectrum_to_xyz(S.blackbody(6500.0, 32), 32)[1]
    assert abs(y - 1.0) < 1e-6


def test_spd_loader(tmp_path):
    p = tmp_path / "test.spd"
    p.write_text("# comment\n400 1.52\n500 1.50\n700 1.48\n")
    v = S.load_spd(str(p), 8)
    assert v.shape == (8,)
    assert v[0] >= v[-1]  # decreasing with wavelength


def test_cauchy_dispersion_direction():
    eta_blue = S.cauchy_ior(440.0)
    eta_red = S.cauchy_ior(650.0)
    assert eta_blue > eta_red > 1.4  # normal dispersion


def test_dispersive_render_produces_fringes():
    """A glass sphere focusing a point light: per-bin IOR differences
    displace the caustic, so the combined image has channel disparity
    that an RGB render (single IOR) lacks."""
    from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
    from mitsuba_path_guiding_tpu.integrators.spectral import render_spectral
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import look_at
    from mitsuba_path_guiding_tpu.scene.transforms import translate

    desc = {
        "sensor": {"type": "perspective", "fov": 40.0,
                   "to_world": look_at([0, 0.4, -3.2], [0, 0, 0])},
        "shapes": [
            {"type": "sphere", "center": [0, 0.4, 0], "radius": 0.5,
             "sphere_res": 24,
             "bsdf": {"type": "dielectric", "int_ior": 1.52, "cauchy_c": 0.03}},
            {"type": "rectangle",  # floor catching the caustic
             "to_world": translate(0, -0.4, 0)
             @ np.array([[2, 0, 0, 0], [0, 0, 2, 0], [0, -2, 0, 0], [0, 0, 0, 1.0]])},
        ],
        "emitters": [{"type": "point", "position": [0.0, 3.0, 0.0],
                      "intensity": [6.0, 6.0, 6.0]}],
    }
    cfg = RenderConfig(width=24, height=24, spp=24, max_depth=5, seed=2)
    img_s = render_spectral(desc, cfg, n_bins=4)
    assert np.isfinite(img_s).all() and img_s.mean() > 1e-3
    # channel disparity in the caustic region exceeds the RGB render's
    img_rgb = np.asarray(render(build_scene(desc), cfg))
    def disparity(im):
        m = im.mean(-1, keepdims=True) + 1e-6
        return np.abs(im - m).max()
    assert disparity(img_s) > 0.0


def test_hero_scan_matches_per_bin_renders():
    """Round-2 compile-once spectral scan (render_spectral_scan) must
    agree with the per-bin-recompile path on the same scene in
    expectation (same transport, different RNG streams)."""
    from mitsuba_path_guiding_tpu.integrators.render import RenderConfig
    from mitsuba_path_guiding_tpu.integrators.spectral import (
        render_spectral,
        render_spectral_scan,
    )
    from mitsuba_path_guiding_tpu.scene.scenes import look_at
    from mitsuba_path_guiding_tpu.scene.transforms import rotate, scale

    desc = {
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": look_at([0, 1.0, -3.0], [0, 0.5, 0])},
        "shapes": [
            {"type": "rectangle", "to_world": rotate([1, 0, 0], -90) @ scale(2.0),
             "bsdf": {"type": "diffuse", "reflectance": [0.7, 0.4, 0.2]}},
            {"type": "cube", "to_world": scale(0.4),
             "bsdf": {"type": "diffuse", "reflectance": [0.2, 0.5, 0.7]}},
        ],
        "emitters": [{"type": "point", "position": [1.0, 3.0, -1.0],
                      "intensity": [5.0, 5.0, 5.0],
                      "spectrum": {"type": "blackbody", "temperature": 5000.0}}],
    }
    cfg = RenderConfig(width=16, height=16, spp=48, max_depth=3, seed=2)
    img_bins = render_spectral(desc, cfg, n_bins=4)
    img_scan = render_spectral_scan(desc, cfg, n_bins=4)
    assert np.isfinite(img_scan).all()
    ratio = img_scan.mean() / max(img_bins.mean(), 1e-9)
    assert abs(ratio - 1.0) < 0.06, ratio
    rel = np.abs(img_scan - img_bins).mean() / max(img_bins.mean(), 1e-9)
    assert rel < 0.25, rel
