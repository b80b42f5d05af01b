"""End-to-end integrator tests: furnace exactness, NEE on/off cross-agreement
(the fork's useNee toggle exists precisely for this — SURVEY.md §4
implication (c)), deterministic reproducibility, and film/IO round trips."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box, furnace


@pytest.fixture(scope="module")
def furnace_scene():
    return build_scene(furnace(albedo=0.5, env_radiance=1.0))


@pytest.fixture(scope="module")
def cornell_scene():
    return build_scene(cornell_box())


def test_furnace_nee(furnace_scene):
    img = np.asarray(
        render(furnace_scene, RenderConfig(width=24, height=24, spp=48, max_depth=5))
    )
    assert np.isfinite(img).all()
    # background sees the env directly
    np.testing.assert_allclose(img[0:3].mean(), 1.0, atol=1e-3)
    # convex diffuse sphere in constant env: L = albedo * env
    assert abs(img[10:14, 10:14].mean() - 0.5) < 0.02


def test_furnace_bsdf_only_exact(furnace_scene):
    # with cosine sampling and constant env the estimator is zero-variance
    img = np.asarray(
        render(
            furnace_scene,
            RenderConfig(width=24, height=24, spp=8, max_depth=5, use_nee=False),
        )
    )
    np.testing.assert_allclose(img[10:14, 10:14].mean(), 0.5, atol=1e-4)


def test_cornell_nee_agreement(cornell_scene):
    cfg_a = RenderConfig(width=32, height=32, spp=64, max_depth=4, seed=0)
    cfg_b = cfg_a._replace(use_nee=False, spp=256, seed=3)
    a = np.asarray(render(cornell_scene, cfg_a))
    b = np.asarray(render(cornell_scene, cfg_b))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # means agree within Monte Carlo noise
    assert abs(a.mean() - b.mean()) / a.mean() < 0.03


def test_deterministic(cornell_scene):
    cfg = RenderConfig(width=16, height=16, spp=4, max_depth=4, seed=11)
    a = np.asarray(render(cornell_scene, cfg))
    b = np.asarray(render(cornell_scene, cfg))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render(cornell_scene, cfg._replace(seed=12)))
    assert not np.array_equal(a, c)


def test_film_filters(cornell_scene):
    cfg = RenderConfig(width=16, height=16, spp=8, max_depth=3, filter_name="tent")
    img = np.asarray(render(cornell_scene, cfg))
    assert np.isfinite(img).all() and img.max() > 0


def test_image_io_roundtrip(tmp_path):
    from mitsuba_path_guiding_tpu.film.film import read_pfm, write_image

    img = np.random.RandomState(0).rand(8, 12, 3).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    write_image(p, img)
    back = read_pfm(p)
    np.testing.assert_allclose(back, img, rtol=1e-6)
    # png/exr/npy just need to not crash and produce bytes
    for ext in ("png", "exr", "npy"):
        write_image(str(tmp_path / f"x.{ext}"), img)
        assert (tmp_path / f"x.{ext}").stat().st_size > 0


def test_exr_readable_header(tmp_path):
    from mitsuba_path_guiding_tpu.film.film import write_exr

    img = np.zeros((4, 4, 3), dtype=np.float32)
    p = tmp_path / "t.exr"
    write_exr(str(p), img)
    magic = p.read_bytes()[:4]
    assert magic == bytes([0x76, 0x2F, 0x31, 0x01])


def test_instances_and_serialized(tmp_path):
    """shapegroup/instance flattening + .serialized roundtrip through the
    scene compiler (reference shapes/instance.cpp, trimesh.cpp format)."""
    import numpy as np

    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.shapes import make_sphere, save_serialized
    from mitsuba_path_guiding_tpu.scene.transforms import look_at, rotate, translate

    path = str(tmp_path / "ball.serialized")
    save_serialized(path, [make_sphere(8, 16)])
    desc = {
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": look_at([0, 0, -6], [0, 0, 0])},
        "shapes": [
            {"type": "shapegroup", "id": "g",
             "shapes": [{"type": "serialized", "filename": path,
                         "bsdf": {"type": "diffuse"}}]},
            {"type": "instance", "ref": "g", "to_world": translate(-1.5, 0, 0)},
            {"type": "instance", "ref": "g", "to_world": translate(1.5, 0, 0)},
            {"type": "rectangle",
             "to_world": translate(0, 0, 2) @ rotate([1, 0, 0], 180),
             "bsdf": {"type": "diffuse"},
             "emitter": {"radiance": [4.0, 4.0, 4.0]}},
        ],
        "emitters": [],
    }
    scene = build_scene(desc)
    # two instances = twice the sphere triangles (+2 light tris)
    n_sphere = len(make_sphere(8, 16).faces)
    assert int(scene.geo.p0.shape[0]) == 2 * n_sphere + 2
    from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render

    img = np.asarray(render(scene, RenderConfig(width=16, height=16, spp=4, max_depth=3)))
    assert np.isfinite(img).all() and img.mean() > 0


def test_sampler_families_render(cornell=None):
    """ldsampler/hammersley camera jitter (reference src/samplers/): each
    family must produce a finite, consistent image."""
    import numpy as np

    from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import cornell_box

    scene = build_scene(cornell_box())
    # converged reference mean (a low-spp independent base is itself too
    # noisy to compare against — firefly-dominated at 12x12)
    ref = np.asarray(
        render(scene, RenderConfig(width=12, height=12, spp=96, max_depth=3, seed=9))
    ).mean()
    for smp in ("ldsampler", "hammersley"):
        cfg = RenderConfig(width=12, height=12, spp=16, max_depth=3, seed=2,
                           sampler=smp)
        img = np.asarray(render(scene, cfg))
        assert np.isfinite(img).all(), smp
        assert abs(img.mean() / ref - 1.0) < 0.12, (smp, img.mean(), ref)


def test_qmc_bounce_dims_reduce_variance():
    """RenderConfig.qmc_bounces: scrambled-Sobol PSS dims for the first
    bounces must cut MSE vs the independent sampler at equal spp
    (reference sobol.cpp extended past the camera dims)."""
    import numpy as np

    from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import cornell_box

    scene = build_scene(cornell_box())
    base = RenderConfig(width=24, height=24, spp=12, max_depth=3)
    ref = np.asarray(render(scene, base._replace(spp=192, seed=17)))
    # MSE is firefly-dominated and seed-volatile -> average over seeds
    mse_ind = mse_qmc = 0.0
    mean_qmc = []
    for seed in (1, 2, 3):
        b = base._replace(seed=seed)
        mse_ind += np.mean((np.asarray(render(scene, b)) - ref) ** 2)
        qmc = np.asarray(render(scene, b._replace(sampler="sobol", qmc_bounces=2)))
        mse_qmc += np.mean((qmc - ref) ** 2)
        mean_qmc.append(qmc.mean())
    assert np.isfinite(mse_qmc)
    # Owen-scrambled Sobol camera + bounce dims: >=25% MSE cut at equal spp
    assert mse_qmc < 0.75 * mse_ind, (mse_qmc, mse_ind)
    # and unbiased: image means agree within Monte Carlo noise
    assert abs(np.mean(mean_qmc) - ref.mean()) < 0.01, (np.mean(mean_qmc), ref.mean())
