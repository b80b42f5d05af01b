"""Irawan woven-cloth BSDF (reference src/bsdfs/irawan.{h,cpp}) — weave
parsing, tile rasterization, and the compiled blend render."""
import numpy as np

from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.models.cloth import (
    PLAIN_WEAVE,
    parse_weave,
    rasterize_weave,
)
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.transforms import look_at


def test_parse_weave_format():
    wp = parse_weave(PLAIN_WEAVE)
    assert wp["tileWidth"] == 2 and wp["tileHeight"] == 2
    assert wp["pattern"] == [1, 2, 2, 1]
    assert len(wp["yarns"]) == 2
    warp, weft = wp["yarns"]
    assert warp["type"] == 0 and weft["type"] == 1
    np.testing.assert_allclose(warp["umax"], np.deg2rad(35.0))
    np.testing.assert_allclose(warp["kd"], [0.45, 0.4, 0.36])


def test_rasterize_weave_tile():
    wp = parse_weave(PLAIN_WEAVE)
    kd, nrm, ks, au, av, w = rasterize_weave(wp, res=16)
    assert kd.shape == (32, 32, 3) and nrm.shape == (32, 32, 3)
    assert np.isfinite(kd).all() and (kd >= 0).all()
    # normal map decodes to unit-ish vectors with positive z
    n = nrm * 2.0 - 1.0
    ln = np.linalg.norm(n, axis=-1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-4)
    assert (n[..., 2] > 0).all()
    # the warp and weft cells carry the two yarn colors
    assert kd[8, 8, 0] != kd[8, 24, 0]


def test_cloth_renders_with_weave_structure():
    desc = {
        "sensor": {"type": "orthographic", "to_world": look_at([0, 0, -2], [0, 0, 0])},
        "shapes": [{"type": "rectangle",
                    "bsdf": {"type": "irawan", "repeatU": 4, "repeatV": 4}}],
        "emitters": [{"type": "point", "position": [1.0, 1.0, -2.0],
                      "intensity": [6.0] * 3}],
    }
    img = np.asarray(render(build_scene(desc), RenderConfig(width=32, height=32, spp=16, max_depth=2)))
    assert np.isfinite(img).all() and img.mean() > 0.01
    # the baked weave produces visible spatial structure
    assert img[8:-8, 8:-8].mean(-1).std() > 0.01
