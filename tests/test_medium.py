"""Heterogeneous-medium tests: grid lookups, unbiased tracking estimators
vs quadrature, fork point-query parity, and grid==homogeneous equivalence
(mirrors the reference's strategy of validating heterogeneous.cpp's
tracking against closed forms; SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.models.medium import (
    _track_keys,
    density_at,
    get_albedo,
    get_sigma_a,
    get_sigma_s,
    get_sigma_t,
    sample_free_flight,
    transmittance_ratio,
)
from mitsuba_path_guiding_tpu.scene.builder import _compile_medium, build_scene
from mitsuba_path_guiding_tpu.scene.scenes import heterogeneous_box, volumetric_box


def _cloud_medium(res=24, sigma_s=0.7, sigma_a=0.2):
    z, y, x = np.meshgrid(*(np.linspace(0, 1, res),) * 3, indexing="ij")
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    dens = np.clip(1.0 - 2.0 * r, 0.0, 1.0) ** 2
    return _compile_medium(
        {
            "sigma_s": [sigma_s] * 3,
            "sigma_a": [sigma_a] * 3,
            "density": dens.astype(np.float32),
            "bounds": ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)),
        }
    ), dens


def test_density_trilinear_nodes():
    med, dens = _cloud_medium(res=16)
    # at exact node positions the trilinear lookup returns the node value
    idx = np.array([[3, 5, 7], [0, 0, 0], [15, 15, 15], [8, 2, 11]])
    p = idx[:, ::-1] / 15.0  # world == grid coords here; (x,y,z) order
    got = np.asarray(density_at(med, jnp.asarray(p, jnp.float32)))
    want = dens[idx[:, 0], idx[:, 1], idx[:, 2]]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
    # outside the box -> 0
    out = np.asarray(density_at(med, jnp.asarray([[2.0, 0.5, 0.5]], jnp.float32)))
    assert out[0] == 0.0


def test_point_queries_fork_parity():
    """Medium::getSigmaA/S/T/getAlbedo (fork heterogeneous.cpp:403-423)."""
    med, dens = _cloud_medium(sigma_s=0.7, sigma_a=0.2)
    p = jnp.asarray([[0.5, 0.5, 0.5], [0.1, 0.9, 0.4]], jnp.float32)
    d = np.asarray(density_at(med, p))
    np.testing.assert_allclose(
        np.asarray(get_sigma_t(med, p)), np.tile(d[:, None] * 0.9, (1, 3)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(get_sigma_s(med, p)), np.tile(d[:, None] * 0.7, (1, 3)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(get_sigma_a(med, p)), np.tile(d[:, None] * 0.2, (1, 3)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(get_albedo(med, p)), np.full((2, 3), 0.7 / 0.9), rtol=1e-5
    )


def _quadrature_tr(med, o, d, t_max, n=4096):
    """Reference transmittance by dense quadrature of the density."""
    ts = (np.arange(n) + 0.5) / n * t_max
    pts = o[None, :] + ts[:, None] * d[None, :]
    dens = np.asarray(density_at(med, jnp.asarray(pts, jnp.float32)))
    base = np.asarray(med.sigma_a + med.sigma_s)
    tau = dens.sum() * (t_max / n)
    return np.exp(-tau * base)


@pytest.mark.parametrize("seed", [0, 1])
def test_ratio_tracking_unbiased(seed):
    med, _ = _cloud_medium()
    o = np.array([0.5, 0.45, -0.5], np.float32)
    d = np.array([0.0, 0.05, 1.0], np.float32)
    d /= np.linalg.norm(d)
    t_max = 2.0
    want = _quadrature_tr(med, o, d, t_max)

    n = 20000
    keys = rng.ray_keys(rng.base_key(seed), jnp.arange(n, dtype=jnp.int32), jnp.zeros(n, jnp.int32))
    tk = _track_keys(keys, jnp.int32(0), 0)
    w = np.asarray(
        transmittance_ratio(
            med,
            jnp.broadcast_to(o, (n, 3)),
            jnp.broadcast_to(d, (n, 3)),
            jnp.full((n,), t_max),
            tk,
        )
    )
    got = w.mean(axis=0)
    np.testing.assert_allclose(got, want, rtol=0.03)


def test_free_flight_pass_probability():
    """Delta tracking through the cloud: the pass-through weight estimates
    the transmittance (unbiasedness of weighted delta tracking)."""
    med, _ = _cloud_medium(sigma_s=0.0, sigma_a=1.5)  # absorption only
    o = np.array([0.5, 0.5, -0.5], np.float32)
    d = np.array([0.0, 0.0, 1.0], np.float32)
    t_max = 2.0
    want = _quadrature_tr(med, o, d, t_max)

    n = 20000
    keys = rng.ray_keys(rng.base_key(7), jnp.arange(n, dtype=jnp.int32), jnp.zeros(n, jnp.int32))
    tk = _track_keys(keys, jnp.int32(0), 0)
    t, is_med, w = sample_free_flight(
        med,
        jnp.broadcast_to(o, (n, 3)),
        jnp.broadcast_to(d, (n, 3)),
        jnp.full((n,), t_max),
        tk,
    )
    w = np.asarray(w)
    passed = ~np.asarray(is_med)
    # sigma_s = 0 -> real collisions absorb (weight contributes 0 radiance);
    # E[w * passed] = Tr
    got = (w * passed[:, None]).mean(axis=0)
    np.testing.assert_allclose(got, want, rtol=0.04)


def test_grid_equals_homogeneous_render():
    """A constant density-1 grid covering the whole scene must render the
    same image as the closed-form homogeneous medium (different estimator,
    same expectation)."""
    base = volumetric_box(sigma_s=0.4, sigma_a=0.1, g=0.0)
    hom = build_scene(base)
    het_desc = volumetric_box(sigma_s=0.4, sigma_a=0.1, g=0.0)
    het_desc["medium"]["density"] = np.ones((2, 2, 2), np.float32)
    het_desc["medium"]["bounds"] = ((-6.0, -6.0, -6.0), (6.0, 6.0, 6.0))
    het = build_scene(het_desc)
    assert het.medium.heterogeneous and not hom.medium.heterogeneous

    cfg = RenderConfig(width=24, height=24, spp=48, max_depth=4, seed=3)
    img_h = np.asarray(render(hom, cfg))
    img_g = np.asarray(render(het, cfg))
    assert np.isfinite(img_g).all()
    # MC noise at 48 spp: compare means tightly, pixels loosely
    np.testing.assert_allclose(img_g.mean(), img_h.mean(), rtol=0.04)
    diff = np.abs(img_g - img_h).mean()
    assert diff < 0.12 * img_h.mean() + 0.02, diff


def test_heterogeneous_box_renders():
    scene = build_scene(heterogeneous_box())
    cfg = RenderConfig(width=16, height=16, spp=8, max_depth=4)
    img = np.asarray(render(scene, cfg))
    assert np.isfinite(img).all()
    assert img.mean() > 0.0


def test_vol_file_roundtrip(tmp_path):
    from mitsuba_path_guiding_tpu.scene.volume import load_vol, save_vol

    data = np.random.RandomState(0).rand(5, 6, 7).astype(np.float32)
    path = str(tmp_path / "grid.vol")
    save_vol(path, data, (-1, -2, -3), (1, 2, 3))
    got, aabb = load_vol(path)
    np.testing.assert_array_equal(got, data)
    np.testing.assert_allclose(aabb, [[-1, -2, -3], [1, 2, 3]])


def test_hgrid_assembly():
    """hgridvolume (reference src/volume/hgridvolume.cpp): sparse block
    container stitched to a dense grid at compile time."""
    import numpy as np

    from mitsuba_path_guiding_tpu.scene.volume import load_volume_spec

    b = np.ones((4, 4, 4), np.float32)
    spec = {
        "type": "hgridvolume", "block_res": 4,
        "blocks": [
            {"offset": (0, 0, 0), "data": b * 1.0},
            {"offset": (1, 1, 1), "data": b * 2.0},
        ],
        "bounds": ((0, 0, 0), (1, 1, 1)),
    }
    grid, aabb = load_volume_spec(spec)
    assert grid.shape == (8, 8, 8)
    assert grid[0, 0, 0] == 1.0 and grid[7, 7, 7] == 2.0
    assert grid[0, 7, 7] == 0.0  # empty block stays zero
    assert aabb.shape == (2, 3)
