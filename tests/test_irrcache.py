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
