"""Aux integrators, QMC samplers, utilities, denoiser, checkpoint tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_path_guiding_tpu.integrators.aux_integrators import (
    render_ao,
    render_direct,
    render_field,
)
from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box


@pytest.fixture(scope="module")
def scene():
    return build_scene(cornell_box())


def test_direct_is_depth1(scene):
    cfg = RenderConfig(width=16, height=16, spp=8, seed=0)
    a = np.asarray(render_direct(scene, cfg))
    b = np.asarray(render(scene, cfg._replace(max_depth=1)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_ao(scene):
    img = np.asarray(render_ao(scene, RenderConfig(width=16, height=16, spp=8)))
    assert np.isfinite(img).all()
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert 0.05 < img.mean() < 0.95  # partially occluded box interior


@pytest.mark.parametrize(
    "field", ["position", "distance", "geo_normal", "sh_normal", "uv", "albedo", "prim_index"]
)
def test_field_aovs(scene, field):
    img = np.asarray(render_field(scene, RenderConfig(width=16, height=16), field))
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    if field in ("geo_normal", "sh_normal"):
        norms = np.linalg.norm(img.reshape(-1, 3), axis=-1)
        assert ((np.abs(norms - 1) < 1e-3) | (norms < 1e-6)).all()


def test_qmc_radical_inverse():
    from mitsuba_path_guiding_tpu.core.qmc import halton_2d, radical_inverse

    idx = jnp.arange(8, dtype=jnp.uint32)
    ri2 = np.asarray(radical_inverse(2, idx))
    np.testing.assert_allclose(
        ri2, [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875], atol=1e-6
    )
    # equidistribution: first 256 Halton points cover the square evenly
    idx = jnp.arange(256, dtype=jnp.uint32)
    pts = np.asarray(halton_2d(idx, jnp.zeros((256, 2))))
    hist, _, _ = np.histogram2d(pts[:, 0], pts[:, 1], bins=4, range=[[0, 1], [0, 1]])
    assert hist.min() >= 12 and hist.max() <= 20  # near-perfect 16/bin


def test_stratified_covers_grid():
    from mitsuba_path_guiding_tpu.core.qmc import stratified_2d

    idx = jnp.arange(16)
    pts = np.asarray(stratified_2d(idx, 16, jnp.full((16, 2), 0.5)))
    # each of the 16 cells visited exactly once
    cells = set((int(x * 4), int(y * 4)) for x, y in pts)
    assert len(cells) == 16


def test_sampler_modes_render(scene):
    for sampler in ("independent", "stratified", "halton"):
        cfg = RenderConfig(width=8, height=8, spp=4, max_depth=2, sampler=sampler)
        img = np.asarray(render(scene, cfg))
        assert np.isfinite(img).all() and img.mean() > 0, sampler


def test_util_tools(tmp_path, scene):
    from mitsuba_path_guiding_tpu.film.film import write_image
    from mitsuba_path_guiding_tpu.util import main as util_main

    img = np.asarray(render(scene, RenderConfig(width=8, height=8, spp=4, max_depth=2)))
    a = str(tmp_path / "a.exr")
    b = str(tmp_path / "b.npy")
    write_image(a, img)
    write_image(b, img * 1.1)
    assert util_main(["tonemap", a, str(tmp_path / "t.png")]) in (0, None)
    assert util_main(["addimages", a, b, str(tmp_path / "s.exr")]) in (0, None)
    assert util_main(["diff", a, b, "-o", str(tmp_path / "d.png")]) in (0, None)
    # EXR round trip through the util reader
    from mitsuba_path_guiding_tpu.util import _read

    back = _read(a)
    np.testing.assert_allclose(back, img, rtol=1e-6, atol=1e-7)

    # joinrgb: three monochrome inputs -> channels (utils/joinrgb.cpp)
    out = str(tmp_path / "rgb.exr")
    assert util_main(["joinrgb", a, b, a, out]) in (0, None)
    joined = _read(out)
    np.testing.assert_allclose(joined[..., 0], img.mean(axis=-1), rtol=1e-5)
    np.testing.assert_allclose(joined[..., 1], (img * 1.1).mean(axis=-1), rtol=1e-4)


def test_util_mesh_tools(tmp_path):
    """scene2obj / serialized2obj / kdbench (reference src/utils/)."""
    from mitsuba_path_guiding_tpu.scene.shapes import (
        load_obj,
        make_sphere,
        save_serialized,
    )
    from mitsuba_path_guiding_tpu.util import main as util_main

    mesh = make_sphere(8, 16)
    ser = str(tmp_path / "m.serialized")
    save_serialized(ser, [mesh])
    obj = str(tmp_path / "m.obj")
    assert util_main(["serialized2obj", ser, obj]) in (0, None)
    back = load_obj(obj)
    assert len(back.faces) == len(mesh.faces)

    obj2 = str(tmp_path / "scene.obj")
    assert util_main(["scene2obj", ser, obj2]) in (0, None)
    assert len(load_obj(obj2).faces) == len(mesh.faces)

    assert util_main(["kdbench", ser, "-x", "4096"]) in (0, None)


def test_checkpoint_roundtrip(scene, tmp_path):
    from mitsuba_path_guiding_tpu.integrators.progressive import (
        ProgressiveConfig,
        ProgressiveRenderer,
    )
    from mitsuba_path_guiding_tpu.utils.checkpoint import (
        load_renderer_state,
        save_renderer_state,
    )

    r = RenderConfig(width=8, height=8, spp=0, max_depth=2)
    cfg = ProgressiveConfig(render=r, samples_per_progression=2, n_progressions=2, guiding=True, grid_res=4, n_lobes=2)
    a = ProgressiveRenderer(scene, cfg)
    a.run_progression()
    p = str(tmp_path / "state.npz")
    save_renderer_state(a, p)

    b = ProgressiveRenderer(scene, cfg)
    load_renderer_state(b, p)
    assert b.sample_counter == a.sample_counter
    np.testing.assert_array_equal(
        np.asarray(a.film.rgb_weight), np.asarray(b.film.rgb_weight)
    )
    # continuing from the restored state matches continuing the original
    a.run_progression()
    b.run_progression()
    np.testing.assert_allclose(
        np.asarray(a.film.rgb_weight), np.asarray(b.film.rgb_weight), atol=1e-6
    )


def test_stats_registry():
    from mitsuba_path_guiding_tpu.utils.stats import StatsRegistry

    s = StatsRegistry()
    s.add("rays traced", 1e6)
    s.add("rays traced", 5e5)
    s.average("avg path length", 3.0)
    s.average("avg path length", 5.0)
    assert s.get("rays traced") == 1.5e6
    assert s.get("avg path length") == 4.0
    rep = s.report()
    assert "rays traced" in rep and "Mrays/s" in rep


def test_envmap_importance_sampling():
    """Textured env: chi-square of sampled dirs vs tabulated pdf, and a
    furnace-style render consistency check."""
    import jax
    from mitsuba_path_guiding_tpu.core import chi2
    from mitsuba_path_guiding_tpu.models import envmap as E

    rs = np.random.RandomState(3)
    img = rs.rand(16, 32, 3).astype(np.float32) ** 2 * 3.0
    img[4:6, 10:14] *= 40.0  # bright blob
    tables = E.build_env_tables(img)

    class EM:  # minimal emitters stand-in
        env_image = tables["env_image"]
        env_cdf_rows = tables["env_cdf_rows"]
        env_cdf_cols = tables["env_cdf_cols"]
        env_pdf_tex = tables["env_pdf_tex"]

    n = 200_000
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, 2))
    d, pdf, rad = E.env_sample(EM, u)
    d = np.asarray(d)

    def pdf_fn(dirs):
        return np.asarray(E.env_pdf_dir(EM, jnp.asarray(dirs)))

    passed, p, msg = chi2.chi2_test_sphere(d, pdf_fn, quad_res=16)
    assert passed, msg
    # eval/sample agreement: radiance returned == lookup at sampled dirs
    np.testing.assert_allclose(
        np.asarray(rad), np.asarray(E.env_eval(EM, jnp.asarray(d))), rtol=1e-5
    )


def test_envmap_render_end_to_end(tmp_path):
    """Scene lit by a textured env; mean pixel brightness follows the env."""
    from mitsuba_path_guiding_tpu.scene.transforms import look_at

    img = np.zeros((8, 16, 3), dtype=np.float32)
    img[0:4] = 2.0   # bright upper hemisphere
    img[4:8] = 0.1
    desc = {
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": look_at([0, 0, -4], [0, 0, 0])},
        "shapes": [
            {"type": "sphere", "center": [0, 0, 0], "radius": 1.0,
             "sphere_res": 24, "bsdf": {"type": "diffuse", "reflectance": [0.8] * 3}}
        ],
        "emitters": [{"type": "envmap", "image": img}],
    }
    sc = build_scene(desc)
    out = np.asarray(render(sc, RenderConfig(width=16, height=16, spp=32, max_depth=3)))
    assert np.isfinite(out).all()
    # background top should be bright (2.0), bottom dim (0.1)
    assert out[0, 8].mean() > 1.5
    assert out[15, 8].mean() < 0.3
    # sphere is lit mostly from above: top of sphere brighter than bottom
    top = out[4:6, 7:9].mean()
    bot = out[10:12, 7:9].mean()
    assert top > bot


def test_textured_reflectance():
    """Checkerboard texture modulates diffuse reflectance (reference
    src/textures/checkerboard.cpp): rendered colors alternate with UV."""
    from mitsuba_path_guiding_tpu.scene.transforms import look_at, rotate
    from mitsuba_path_guiding_tpu.scene.transforms import scale as S

    desc = {
        "sensor": {"type": "perspective", "fov": 40.0,
                   "to_world": look_at([0, 3, 0.01], [0, 0, 0])},
        "shapes": [
            {"type": "rectangle", "to_world": rotate([1, 0, 0], -90) @ S(2),
             "bsdf": {"type": "diffuse", "reflectance": [0.5] * 3,
                      "texture": {"type": "checkerboard",
                                  "color0": [1.0, 0.0, 0.0],
                                  "color1": [0.0, 0.0, 1.0],
                                  "uscale": 1, "vscale": 1}}},
        ],
        "emitters": [{"type": "constant", "radiance": [1.0] * 3}],
    }
    sc = build_scene(desc)
    img = np.asarray(render(sc, RenderConfig(width=32, height=32, spp=16, max_depth=1)))
    assert np.isfinite(img).all()
    # looking straight down: quadrants alternate red/blue
    q1 = img[8, 8]    # one quadrant
    q2 = img[8, 24]   # neighbor quadrant
    assert (q1[0] > q1[2]) != (q2[0] > q2[2]), (q1, q2)


def test_texture_atlas_bilinear():
    from mitsuba_path_guiding_tpu.models.texture import build_atlas, sample_atlas

    img = np.zeros((4, 4, 3), np.float32)
    img[:, :2] = 1.0  # left half white
    atlas, sizes = build_atlas([img])
    tid = jnp.zeros((3,), jnp.int32)
    uv = jnp.asarray([[0.15, 0.5], [0.85, 0.5], [0.5, 0.5]])
    out = np.asarray(sample_atlas(atlas, sizes, tid, uv))
    assert out[0].mean() > 0.9   # left: white
    assert out[1].mean() < 0.1   # right: black
    assert 0.2 < out[2].mean() < 0.8  # seam: blend


def test_orthographic_and_spherical_sensors():
    from mitsuba_path_guiding_tpu.scene.transforms import look_at

    # orthographic: a unit sphere at origin viewed head-on fills a constant
    # fraction regardless of distance (no perspective shrink)
    for dist in (3.0, 6.0):
        desc = {
            "sensor": {"type": "orthographic", "ortho_width": 2.0,
                       "to_world": look_at([0, 0, -dist], [0, 0, 0])},
            "shapes": [{"type": "sphere", "center": [0, 0, 0], "radius": 1.0,
                        "sphere_res": 16,
                        "bsdf": {"type": "diffuse", "reflectance": [0.9] * 3}}],
            "emitters": [{"type": "constant", "radiance": [1.0] * 3}],
        }
        sc = build_scene(desc)
        img = np.asarray(render(sc, RenderConfig(width=16, height=16, spp=4, max_depth=2)))
        sphere_frac = (np.abs(img.mean(-1) - 1.0) > 0.05).mean()
        assert 0.6 < sphere_frac / (np.pi / 4 / 4) < 1.4, (dist, sphere_frac)

    # spherical: camera inside the cornell box sees geometry in every pixel
    sc = build_scene(cornell_box())
    desc_s = cornell_box()
    desc_s["sensor"] = {"type": "spherical",
                        "to_world": look_at([0, 1, 0], [0, 1, 1])}
    sc2 = build_scene(desc_s)
    img = np.asarray(render(sc2, RenderConfig(width=16, height=8, spp=8, max_depth=3)))
    assert np.isfinite(img).all()
    assert (img.sum(-1) > 0).mean() > 0.9  # almost all directions lit


def test_veach_mis_scene_renders():
    """Built-in Veach MIS scene (BASELINE config 3 family): glossy plates +
    varied light sizes; MIS keeps the estimator finite and converged."""
    from mitsuba_path_guiding_tpu.scene.scenes import veach_mis

    sc = build_scene(veach_mis())
    img_a = np.asarray(render(sc, RenderConfig(width=32, height=32, spp=64, max_depth=3, seed=0)))
    img_b = np.asarray(render(sc, RenderConfig(width=32, height=32, spp=64, max_depth=3, seed=99)))
    assert np.isfinite(img_a).all()
    assert img_a.mean() > 1e-3
    # independent runs agree loosely (tiny bright lights + near-specular
    # plates are genuinely high variance at this budget; MIS bounds it)
    rel = abs(img_a.mean() - img_b.mean()) / img_a.mean()
    assert rel < 0.5, rel
    # medians are much more stable than means under firefly noise
    med_rel = abs(np.median(img_a) - np.median(img_b)) / max(np.median(img_a), 1e-6)
    assert med_rel < 0.2, med_rel


def test_point_light_inverse_square():
    """Point emitter: irradiance on a floor falls off as cos/d^2
    (reference emitters/point.cpp)."""
    from mitsuba_path_guiding_tpu.scene.transforms import look_at, rotate
    from mitsuba_path_guiding_tpu.scene.transforms import scale as S

    desc = {
        "sensor": {"type": "orthographic", "ortho_width": 2.0,
                   "to_world": look_at([0, 4, 0.001], [0, 0, 0])},
        "shapes": [{"type": "rectangle", "to_world": rotate([1, 0, 0], -90) @ S(4),
                    "bsdf": {"type": "diffuse", "reflectance": [1.0] * 3}}],
        "emitters": [{"type": "point", "position": [0, 1, 0],
                      "intensity": [1.0] * 3}],
    }
    sc = build_scene(desc)
    img = np.asarray(render(sc, RenderConfig(width=33, height=33, spp=8, max_depth=1)))
    # analytic: L = rho/pi * I * cos/d^2; center: d=1, cos=1 -> 1/pi
    center = img[16, 16].mean()
    np.testing.assert_allclose(center, 1 / np.pi, rtol=0.02)
    # at r=1 on the floor: d^2 = 2, cos = 1/sqrt(2) -> (1/pi) * 2^-1.5
    off = img[16, 24].mean()  # 8 px = 1 world unit (33px over 4 units)
    np.testing.assert_allclose(off / center, 2 ** -1.5, rtol=0.05)


def test_directional_light_shadow():
    from mitsuba_path_guiding_tpu.scene.transforms import look_at, rotate, translate
    from mitsuba_path_guiding_tpu.scene.transforms import scale as S

    desc = {
        "sensor": {"type": "orthographic", "ortho_width": 2.0,
                   "to_world": look_at([0, 4, 0.001], [0, 0, 0])},
        "shapes": [
            {"type": "rectangle", "to_world": rotate([1, 0, 0], -90) @ S(4),
             "bsdf": {"type": "diffuse", "reflectance": [1.0] * 3}},
            # floating square casting a straight-down shadow
            {"type": "rectangle",
             "to_world": translate(0, 1, 0) @ rotate([1, 0, 0], -90) @ S(0.5),
             "bsdf": {"type": "diffuse", "reflectance": [0.0] * 3}},
        ],
        "emitters": [{"type": "directional", "direction": [0, -1, 0],
                      "irradiance": [1.0] * 3}],
    }
    sc = build_scene(desc)
    img = np.asarray(render(sc, RenderConfig(width=32, height=32, spp=4, max_depth=1)))
    # lit floor: L = rho/pi * E * cos = 1/pi; shadow: 0
    lit = img[4, 4].mean()
    shadow = img[16, 16].mean()
    np.testing.assert_allclose(lit, 1 / np.pi, rtol=0.02)
    assert shadow < 1e-4


def test_spot_light_cone():
    from mitsuba_path_guiding_tpu.scene.transforms import look_at, rotate
    from mitsuba_path_guiding_tpu.scene.transforms import scale as S

    desc = {
        "sensor": {"type": "orthographic", "ortho_width": 2.0,
                   "to_world": look_at([0, 4, 0.001], [0, 0, 0])},
        "shapes": [{"type": "rectangle", "to_world": rotate([1, 0, 0], -90) @ S(4),
                    "bsdf": {"type": "diffuse", "reflectance": [1.0] * 3}}],
        "emitters": [{"type": "spot", "intensity": [1.0] * 3,
                      "cutoff_angle": 20.0,
                      "to_world": look_at([0, 1, 0], [0, 0, 0])}],
    }
    sc = build_scene(desc)
    img = np.asarray(render(sc, RenderConfig(width=33, height=33, spp=8, max_depth=1)))
    center = img[16, 16].mean()
    corner = img[2, 2].mean()
    np.testing.assert_allclose(center, 1 / np.pi, rtol=0.05)  # inside beam
    assert corner < 1e-4  # outside the 20-degree cone


def test_multichannel_render_and_exr_roundtrip(tmp_path):
    """misc/multichannel.cpp parity: several sub-integrators -> one
    multichannel EXR with name-prefixed channels."""
    import numpy as np

    from mitsuba_path_guiding_tpu.integrators.aux_integrators import (
        render_multichannel,
        write_multichannel_exr,
    )
    from mitsuba_path_guiding_tpu.integrators.render import RenderConfig
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import cornell_box

    scene = build_scene(cornell_box())
    cfg = RenderConfig(width=8, height=8, spp=4, max_depth=3, seed=1)
    out = render_multichannel(scene, cfg, ["path", "albedo", "distance"])
    assert set(out) == {"path", "albedo", "distance"}
    for img in out.values():
        a = np.asarray(img)
        assert a.shape == (8, 8, 3) and np.isfinite(a).all()
    path = str(tmp_path / "multi.exr")
    write_multichannel_exr(path, out)
    # header must list the prefixed channels
    head = open(path, "rb").read(400)
    assert b"albedo.R" in head and b"distance.B" in head and b"R\x00" in head


def test_pick_emitter_matches_searchsorted():
    """The dense (E, N) compare+sum CDF inversion (_pick_emitter,
    models/emitter.py — searchsorted lowers to a serial binary search on
    TPU) must agree with jnp.searchsorted(side='right') for random CDFs,
    including u exactly on a CDF boundary and u ~ 1."""
    from mitsuba_path_guiding_tpu.models.emitter import _pick_emitter

    rng = np.random.default_rng(11)
    for e in (1, 2, 7, 33):
        w = rng.random(e) + 0.01
        cdf = np.cumsum(w / w.sum()).astype(np.float32)
        cdf[-1] = 1.0
        u = np.concatenate([
            rng.random(257).astype(np.float32),
            cdf[:-1],                      # exact boundaries
            np.array([0.0, 1.0 - 1e-7, 1.0], np.float32),
        ])

        class _Em:
            pass

        em = _Em()
        em.cdf = jnp.asarray(cdf)
        em.kind = jnp.zeros((e,), jnp.int32)
        got = np.asarray(_pick_emitter(em, jnp.asarray(u)))
        want = np.clip(np.searchsorted(cdf, u, side="right"), 0, e - 1)
        np.testing.assert_array_equal(got, want)


def test_adaptive_statistical_stopping(scene):
    """Reference adaptive.cpp: per-pixel sampling stops when the (1-p)
    normal-quantile confidence interval on mean luminance narrows below
    max_error * max(mean, 1% avg luminance); budget capped at
    max_sample_factor * base_spp.  Checks the quantile math, that the
    accumulator is exactly unbiased (capped pixels reproduce the uniform
    render bit-for-bit), and that the criterion differentiates pixels."""
    import jax.numpy as jnp

    from mitsuba_path_guiding_tpu.integrators.aux_integrators import (
        _normal_quantile,
        render_adaptive,
    )
    from mitsuba_path_guiding_tpu.integrators.render import render_wave

    # boost::math::quantile(normal, 1 - 0.05/2) == 1.95996...
    assert abs(_normal_quantile(0.05) - 1.959964) < 1e-4
    assert abs(_normal_quantile(0.32) - 0.994458) < 1e-4

    cfg = RenderConfig(width=16, height=16, spp=8, max_depth=4, seed=5)
    # max_error=0: every pixel with any variance runs to the cap; those
    # capped pixels must match a uniform cap-spp accumulation EXACTLY
    img, info = render_adaptive(
        scene, cfg, base_spp=8, max_sample_factor=8, max_error=0.0
    )
    spp = info["spp"]
    assert spp.min() >= 8 and spp.max() == 64
    pix = jnp.arange(256, dtype=jnp.int32)
    acc = jnp.zeros((256, 3))
    for s in range(64):
        _, L, _ = render_wave(scene, cfg, pix, jnp.full_like(pix, s), None, None)
        acc = acc + L
    ref = np.asarray(acc / 64).reshape(16, 16, 3)
    capped = spp == 64
    assert capped.sum() > 100
    np.testing.assert_array_equal(np.asarray(img)[capped], ref[capped])
    # pixels that stopped early did so with a zero CI (zero sample variance
    # over the pilot — e.g. pure black or fully-emitter pixels), exactly the
    # reference's behavior for ciWidth <= 0 * base
    assert (info["ci_width"][~capped] == 0.0).all()

    # a real threshold must differentiate pixels and respect both bounds
    img2, info2 = render_adaptive(
        scene, cfg, base_spp=8, max_sample_factor=16, max_error=0.05
    )
    spp2 = info2["spp"]
    assert spp2.min() >= 8 and spp2.max() <= 128
    assert spp2.max() > spp2.min()
    # converged (non-capped, non-degenerate) pixels satisfy the criterion
    done = (spp2 < 128) & (spp2 > 8)
    assert done.any()
    mean_lum = np.asarray(img2).mean(-1)
    base = np.maximum(mean_lum, 0.01 * mean_lum.mean())
    assert (info2["ci_width"][done] <= 0.05 * base[done] * 1.5).all()
