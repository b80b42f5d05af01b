"""Classic photon mapper: image agreement with the path tracer on the
Cornell box (biased but consistent; generous tolerance like the VPL test —
the reference validates photonmapper the same way, SURVEY.md §4)."""
import numpy as np
import pytest

from mitsuba_path_guiding_tpu.integrators.photonmapper import render_photonmapper
from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box


@pytest.fixture(scope="module")
def cornell():
    return build_scene(cornell_box())


def test_photonmapper_matches_pt(cornell):
    img_pt = np.asarray(
        render(cornell, RenderConfig(width=16, height=16, spp=256, max_depth=4, seed=3))
    )
    img_pm = np.asarray(
        render_photonmapper(
            cornell,
            RenderConfig(width=16, height=16, spp=24, max_depth=4, seed=5),
            n_photons=1 << 16,
        )
    )
    assert np.isfinite(img_pm).all()
    ratio = img_pm.mean() / img_pt.mean()
    assert 0.80 < ratio < 1.20, ratio


def test_caustic_map_flags():
    """photon_pass's all-specular flag: a scene with no specular materials
    produces zero caustic deposits."""
    import jax.numpy as jnp

    from mitsuba_path_guiding_tpu.core import rng
    from mitsuba_path_guiding_tpu.integrators.sppm import photon_pass

    sc = build_scene(cornell_box())
    rk = rng.ray_keys(rng.base_key(0), jnp.arange(4096, dtype=jnp.int32),
                      jnp.zeros((4096,), jnp.int32))
    _, _, _, ok, caustic = photon_pass(sc, rk, max_depth=4)
    ok, caustic = np.asarray(ok), np.asarray(caustic)
    assert ok.any()
    assert not (ok & caustic).any()  # all-diffuse box: no LS+ paths
