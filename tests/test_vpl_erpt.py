"""VPL + ERPT consistency tests.

Mirrors the reference's validation style (integrator-vs-integrator image
agreement, SURVEY.md §4): ERPT is unbiased and must match PT closely;
VPL is biased by the instant-radiosity distance clamp (vpl.cpp's relative
clamping) so the tolerance is generous and the scene all-diffuse.
"""
import numpy as np
import pytest

from mitsuba_path_guiding_tpu.integrators.erpt import render_erpt
from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.integrators.vpl import generate_vpls, render_vpl
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box


@pytest.fixture(scope="module")
def cornell():
    return build_scene(cornell_box())


def test_vpl_matches_pt_diffuse(cornell):
    img_pt = np.asarray(
        render(cornell, RenderConfig(width=16, height=16, spp=256, max_depth=3, seed=3))
    )
    img_v = np.asarray(
        render_vpl(
            cornell,
            RenderConfig(width=16, height=16, spp=4, max_depth=3, seed=5),
            n_vpl_paths=1024,
            clamp_dist=0.02,
        )
    )
    ratio = img_v.mean() / img_pt.mean()
    # clamping removes energy; VPL should land slightly below PT, never above
    assert 0.85 < ratio < 1.05, ratio
    rel = np.abs(img_v - img_pt).mean() / img_pt.mean()
    assert rel < 0.25, rel  # VPL noise at 1k paths + clamp bias


def test_vpl_generation_shapes(cornell):
    vpls = generate_vpls(cornell, n_paths=64, seed=0, max_depth=3)
    v = int(vpls.pos.shape[0])
    assert vpls.flux.shape == (v, 3)
    assert bool(np.asarray(vpls.valid).any())
    # emission VPLs present (mid == -1)
    assert bool((np.asarray(vpls.mid) == -1).any())


def test_erpt_matches_pt(cornell):
    img_pt = np.asarray(
        render(cornell, RenderConfig(width=16, height=16, spp=256, max_depth=4, seed=3))
    )
    img_e = np.asarray(
        render_erpt(
            cornell,
            RenderConfig(width=16, height=16, spp=24, max_depth=4, seed=11),
            chain_length=12,
        )
    )
    ratio = img_e.mean() / img_pt.mean()
    assert abs(ratio - 1.0) < 0.06, ratio
