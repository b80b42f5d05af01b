"""Out-of-core tiled film (reference films/tiledhdrfilm.cpp): band-streamed
EXR output matching the in-memory render."""
import numpy as np

from mitsuba_path_guiding_tpu.film.tiled import render_tiled
from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box
from mitsuba_path_guiding_tpu.util import _read


def test_tiled_matches_inmemory(tmp_path):
    scene = build_scene(cornell_box())
    cfg = RenderConfig(width=24, height=24, spp=4, max_depth=3, seed=1)
    path = str(tmp_path / "tiled.exr")
    render_tiled(scene, cfg, path, band_rows=7)  # deliberately ragged bands
    img_t = _read(path)
    img_m = np.asarray(render(scene, cfg))
    assert img_t.shape == (24, 24, 3)
    np.testing.assert_allclose(img_t, img_m, rtol=2e-4, atol=2e-5)
