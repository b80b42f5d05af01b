"""End-to-end scenes exercising the wrapper materials through the scene
compiler and the wavefront integrator (blend/mixture/mask/normalmap/bumpmap/
ward/difftrans — reference src/bsdfs/ parity rows)."""
import numpy as np

from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box


def _with_tallbox_bsdf(bsdf):
    sc = cornell_box()
    sc["shapes"][5]["bsdf"] = bsdf
    return build_scene(sc)


def _render_mean(scene, spp=8):
    img = np.asarray(
        render(scene, RenderConfig(width=16, height=16, spp=spp, max_depth=4))
    )
    assert np.isfinite(img).all()
    return img.mean()


def test_blend_scene():
    m = _render_mean(
        _with_tallbox_bsdf(
            {
                "type": "blendbsdf",
                "weight": 0.4,
                "bsdfs": [
                    {"type": "diffuse", "reflectance": [0.7, 0.2, 0.2]},
                    {"type": "roughconductor", "material": "Au", "alpha": 0.2},
                ],
            }
        )
    )
    assert m > 0.0


def test_mixture_scene():
    m = _render_mean(
        _with_tallbox_bsdf(
            {
                "type": "mixturebsdf",
                "weights": [0.7, 0.3],
                "bsdfs": [
                    {"type": "diffuse", "reflectance": [0.2, 0.6, 0.8]},
                    {"type": "phong", "alpha": 0.2},
                ],
            }
        )
    )
    assert m > 0.0


def test_mask_scene():
    """Opacity 0.0 mask behaves like an invisible surface: the tall box
    disappears (image close to a cornell box without it)."""
    sc_mask = _with_tallbox_bsdf(
        {"type": "mask", "opacity": [0.0] * 3, "bsdf": {"type": "diffuse"}}
    )
    base = cornell_box()
    del base["shapes"][5]
    sc_removed = build_scene(base)
    # pass-throughs consume depth budget (the wavefront loop counts every
    # vertex, like the reference's path tracer) — give them headroom
    cfg = RenderConfig(width=24, height=24, spp=24, max_depth=9, seed=1)
    img_m = np.asarray(render(sc_mask, cfg))
    img_r = np.asarray(render(sc_removed, cfg))
    np.testing.assert_allclose(img_m.mean(), img_r.mean(), rtol=0.05)


def test_ward_difftrans_scene():
    m = _render_mean(
        _with_tallbox_bsdf({"type": "ward", "alpha_u": 0.1, "alpha_v": 0.4})
    )
    assert m > 0.0
    m2 = _render_mean(_with_tallbox_bsdf({"type": "difftrans"}))
    assert m2 > 0.0


def test_normalmap_and_bumpmap_scene():
    rs = np.random.RandomState(0)
    # tangent-space normal map tilting around z
    ang = rs.rand(8, 8) * 2 * np.pi
    n = np.stack([0.3 * np.cos(ang), 0.3 * np.sin(ang), np.ones_like(ang)], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    nm = ((n + 1) / 2).astype(np.float32)
    m = _render_mean(
        _with_tallbox_bsdf(
            {"type": "normalmap", "texture": {"type": "bitmap", "image": nm},
             "bsdf": {"type": "diffuse", "reflectance": [0.6, 0.6, 0.6]}}
        )
    )
    assert m > 0.0
    height = rs.rand(16, 16, 3).astype(np.float32)
    m2 = _render_mean(
        _with_tallbox_bsdf(
            {"type": "bumpmap", "texture": {"type": "bitmap", "image": height},
             "scale": 0.02, "bsdf": {"type": "diffuse"}}
        )
    )
    assert m2 > 0.0


def test_flat_normalmap_matches_plain():
    """A constant (0,0,1) normal map must not change the image."""
    flat = np.full((4, 4, 3), [0.5, 0.5, 1.0], np.float32)
    sc_nm = _with_tallbox_bsdf(
        {"type": "normalmap", "texture": {"type": "bitmap", "image": flat},
         "bsdf": {"type": "diffuse", "reflectance": [0.725, 0.71, 0.68]}}
    )
    sc_plain = build_scene(cornell_box())
    cfg = RenderConfig(width=16, height=16, spp=16, max_depth=4, seed=2)
    img_a = np.asarray(render(sc_nm, cfg))
    img_b = np.asarray(render(sc_plain, cfg))
    np.testing.assert_allclose(img_a, img_b, rtol=2e-2, atol=2e-3)
