"""Cylinder / heightfield / hair tessellators (reference src/shapes/
{cylinder,heightfield,hair}.cpp) — geometric invariants + e2e renders."""
import numpy as np

from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.shapes import (
    load_hair,
    make_cylinder,
    make_hair,
    make_heightfield,
)
from mitsuba_path_guiding_tpu.scene.scenes import look_at


def test_cylinder_geometry():
    m = make_cylinder((0, 0, 0), (0, 0, 2.0), radius=0.5, res=64)
    v = m.vertices
    r = np.sqrt(v[:, 0] ** 2 + v[:, 1] ** 2)
    np.testing.assert_allclose(r, 0.5, atol=1e-12)
    assert v[:, 2].min() == 0.0 and v[:, 2].max() == 2.0
    # total lateral area ~ 2 pi r h
    p0, e1, e2 = m.vertices[m.faces[:, 0]], 0, 0
    a = m.vertices[m.faces[:, 1]] - p0
    b = m.vertices[m.faces[:, 2]] - p0
    area = 0.5 * np.linalg.norm(np.cross(a, b), axis=-1).sum()
    np.testing.assert_allclose(area, 2 * np.pi * 0.5 * 2.0, rtol=2e-3)
    # shading normals radial
    nz = np.abs(m.normals[:, 2]).max()
    assert nz < 1e-12


def test_heightfield_geometry():
    h = np.zeros((17, 17))
    m0 = make_heightfield(h)
    assert np.abs(m0.vertices[:, 2]).max() == 0.0
    hx = np.linspace(0, 1, 17)[None, :].repeat(17, 0)
    m = make_heightfield(hx, scale=2.0)
    assert abs(m.vertices[:, 2].max() - 2.0) < 1e-12
    # slope plane: normals constant and tilted against +x
    n = m.normals
    assert np.allclose(n, n[0], atol=1e-6)
    assert n[0][0] < 0 and n[0][2] > 0


def test_hair_ascii_roundtrip(tmp_path):
    p = tmp_path / "strands.hair"
    p.write_text("0 0 0\n0 0 1\n0 0 2\n\n1 0 0\n1 0 1\n")
    fibers = load_hair(str(p))
    assert len(fibers) == 2
    assert fibers[0].shape == (3, 3) and fibers[1].shape == (2, 3)
    m = make_hair({"fibers": fibers, "radius": 0.1, "sides": 4})
    # 2 segments * 4 sides * 2 tris + 1 segment * 8
    assert len(m.faces) == 2 * 4 * 2 + 1 * 4 * 2
    r = np.sqrt(m.vertices[:, 0] ** 2 + (m.vertices[:, 1]) ** 2)
    # fiber 0 at x=0, fiber 1 at x=1; all ring points at radius 0.1
    d0 = np.linalg.norm(m.vertices[:12, :2], axis=-1)
    np.testing.assert_allclose(d0, 0.1, atol=1e-9)


def test_hair_binary(tmp_path):
    import struct

    p = tmp_path / "strands_bin.hair"
    data = [0, 0, 0, 0, 0, 1, np.inf, 1, 0, 0, 1, 0, 1]
    with open(p, "wb") as f:
        f.write(b"BINARY_HAIR")
        f.write(struct.pack("<I", 4))
        f.write(np.asarray(data, dtype="<f4").tobytes())
    fibers = load_hair(str(p))
    assert len(fibers) == 2 and all(len(f) == 2 for f in fibers)


def test_new_shapes_render():
    sc = {
        "sensor": {
            "type": "perspective", "fov": 60.0,
            "to_world": look_at([0, 1.5, -4.0], [0, 0.5, 0]),
        },
        "shapes": [
            {"type": "cylinder", "p0": [-1, 0, 0], "p1": [-1, 1.5, 0],
             "radius": 0.3, "bsdf": {"type": "diffuse"}},
            {"type": "heightfield",
             "heights": (np.sin(np.linspace(0, 6, 24))[None, :]
                         * np.ones((24, 1)) * 0.1),
             "bsdf": {"type": "diffuse"},
             "to_world": np.array([[2, 0, 0, 0], [0, 0, 2, 0],
                                   [0, -2, 0, 0], [0, 0, 0, 1.0]])},
            {"type": "hair",
             "fibers": [[[0.5, 0.0, 0.0], [0.6, 0.8, 0.0], [0.7, 1.4, 0.2]]],
             "radius": 0.08, "bsdf": {"type": "diffuse"}},
        ],
        "emitters": [{"type": "constant", "radiance": [1.0, 1.0, 1.0]}],
    }
    scene = build_scene(sc)
    img = np.asarray(
        render(scene, RenderConfig(width=16, height=16, spp=8, max_depth=2, seed=1))
    )
    assert np.isfinite(img).all() and img.mean() > 0.05
