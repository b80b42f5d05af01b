"""Irawan woven-cloth BSDF (reference src/bsdfs/irawan.{h,cpp}) — weave
parsing, the baked yarn-record tile, and the compiled CLOTH render."""
import numpy as np

from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.models.cloth import (
    PLAIN_WEAVE,
    compile_cloth,
    decode_record,
    parse_weave,
    segment_lookup,
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
    # fields AFTER a value list must survive (the pre-round-5 parser
    # stopped the yarn block at kd's closing brace and lost ks)
    np.testing.assert_allclose(warp["ks"], [0.2, 0.19, 0.18])
    np.testing.assert_allclose(weft["ks"], [0.18, 0.18, 0.2])


def test_parse_weave_dollar_params():
    """$identifier placeholders resolve from plugin properties
    (irawan.h:309-319, irawan.cpp 'additional parameters') — floats and
    RGB triples; unresolved names raise like the Properties lookup."""
    import pytest

    text = PLAIN_WEAVE.replace(
        "kd = {0.45, 0.4, 0.36}", "kd = $warp_kd"
    ).replace("umax = 35, kappa = 0.5, width = 1, length = 1,\n           centerU = 0.5, centerV = 0.5,\n           kd = {0.4, 0.36, 0.45}",
              "umax = $umax, kappa = 0.5, width = 1, length = 1,\n           centerU = 0.5, centerV = 0.5,\n           kd = {0.4, 0.36, 0.45}")
    wp = parse_weave(text, {"warp_kd": [0.7, 0.1, 0.2], "umax": 20.0})
    np.testing.assert_allclose(wp["yarns"][0]["kd"], [0.7, 0.1, 0.2])
    np.testing.assert_allclose(wp["yarns"][1]["umax"], np.deg2rad(20.0))
    with pytest.raises(ValueError, match="warp_kd"):
        parse_weave(text, {"umax": 20.0})


def test_compile_cloth_tile():
    wp = parse_weave(PLAIN_WEAVE)
    cc = compile_cloth(wp, res=16)
    assert cc["kd_img"].shape == (32, 32, 3)
    assert cc["aux_img"].shape == (32, 32, 3)
    assert np.isfinite(cc["kd_img"]).all() and (cc["kd_img"] >= 0).all()
    assert cc["norm"] > 0 and cc["fb_scale"] > 0
    # the warp and weft cells carry the two yarn colors
    assert cc["kd_img"][8, 8, 0] != cc["kd_img"][8, 24, 0]


def test_yarn_record_roundtrip():
    """decode(bake(uv)) must reproduce the weave-cell walk at texel
    centers THROUGH the renderer's fetch convention (wrap + v flip) —
    pins the bake orientation against texture.py sample_atlas_nearest."""
    wp = parse_weave(PLAIN_WEAVE)
    cc = compile_cloth(wp, res=16)
    H, W = cc["aux_img"].shape[:2]
    rng = np.random.default_rng(2)
    uv = rng.random((4096, 2))
    px = np.clip((uv[:, 0] % 1.0 * W).astype(np.int64), 0, W - 1)
    py = np.clip(((1.0 - uv[:, 1]) % 1.0 * H).astype(np.int64), 0, H - 1)
    weft_d, u_d, v_d, ks_d = decode_record(cc["aux_img"][py, px])
    # texel-center snapped uv -> exact records
    uc = (px + 0.5) / W
    vc = 1.0 - (py + 0.5) / H
    weft_e, u_e, v_e, _ = segment_lookup(wp, uc, vc)
    assert (weft_d == weft_e).all()
    np.testing.assert_allclose(u_d, u_e, atol=1e-5)
    np.testing.assert_allclose(v_d, v_e, atol=1e-5)
    assert np.isfinite(ks_d).all() and (ks_d > 0).all()


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
