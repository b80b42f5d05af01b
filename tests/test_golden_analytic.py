"""Closed-form golden values — the converged numbers the reference CLI
would produce (see tests/golden/README.md for why the reference binary
itself cannot be built in this image).

The coaxial-disk case renders the REFERENCE'S OWN test_bidir_0.xml
fixture geometry: emitter disk (radiance 1) at z=+1, receiver disk with
an irradiancemeter at z=-1.  Irradiance at the receiver's center from a
unit disk of radiance L at axial distance h is the classic
E = pi * L * r^2 / (r^2 + h^2)."""
import glob
import json
import os

import numpy as np
import pytest

from mitsuba_path_guiding_tpu.integrators.render import RenderConfig, render
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.xml_loader import load_scene_xml

REF = "/root/reference/data/tests"
GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__)) + "/golden"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference absent")
def test_coaxial_disks_fixture_analytic():
    desc, settings = load_scene_xml(os.path.join(REF, "test_bidir_0.xml"))
    scene = build_scene(desc)
    img = np.asarray(
        render(scene, RenderConfig(width=4, height=4, spp=512, max_depth=3, seed=3))
    )
    # E(center) = pi * L * r^2/(r^2+h^2), L=1, r=1, h=2 -> pi/5
    expect = np.pi / 5.0
    got = float(img.mean())
    assert abs(got / expect - 1.0) < 0.05, (got, expect)


def test_point_light_inverse_square():
    """Direct irradiance on a diffuse floor from a point light: the pixel
    under the light sees L = Phi_intensity * cos/ (pi r^2) * albedo."""
    desc = {
        "shapes": [
            {"type": "rectangle",
             "to_world": np.diag([10.0, 10.0, 1.0, 1.0]),
             "bsdf": {"type": "diffuse", "reflectance": [1.0, 1.0, 1.0]}},
        ],
        "emitters": [{"type": "point", "position": [0.0, 0.0, 2.0],
                      "intensity": [1.0, 1.0, 1.0]}],
        "sensor": {"type": "radiancemeter",
                   "to_world": _look_at([0, 0.0, 1.0], [0, 0, 0])},
    }
    scene = build_scene(desc)
    img = np.asarray(
        render(scene, RenderConfig(width=2, height=2, spp=256, max_depth=2, seed=5))
    )
    expect = 1.0 / (np.pi * 4.0)  # I/r^2 * cos(0) * (rho/pi), rho=1, r=2
    got = float(img.mean())
    assert abs(got / expect - 1.0) < 0.03, (got, expect)


def _look_at(origin, target):
    from mitsuba_path_guiding_tpu.scene.transforms import look_at

    return look_at(origin, target, [0.0, 1.0, 0.0])


def test_golden_dir_images():
    """Future-proof hook: any (image.exr, image.json) pair dropped into
    tests/golden/ by a real reference build is rendered and compared."""
    pairs = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.json")))
    if not pairs:
        pytest.skip("no pinned golden images (see tests/golden/README.md)")
    from mitsuba_path_guiding_tpu.film.exr import read_exr_rgb

    for meta_path in pairs:
        meta = json.load(open(meta_path))
        golden = read_exr_rgb(meta_path.replace(".json", ".exr"))
        desc, settings = load_scene_xml(meta["scene"])
        scene = build_scene(desc)
        cfg = RenderConfig(
            width=golden.shape[1], height=golden.shape[0],
            spp=int(meta.get("spp", settings["spp"])),
            max_depth=int(meta.get("max_depth", settings["max_depth"])),
        )
        img = np.asarray(render(scene, cfg))
        err = np.abs(img - golden).mean() / max(golden.mean(), 1e-6)
        assert err < float(meta.get("tolerance", 0.05)), (meta_path, err)
