"""AnimatedTransform + motion integrator + time-sliced motion blur
(reference track.h, misc/motion.cpp, shapes/deformable.cpp)."""
import numpy as np

from mitsuba_path_guiding_tpu.integrators.motion import render_motion, render_motion_blur
from mitsuba_path_guiding_tpu.integrators.render import RenderConfig
from mitsuba_path_guiding_tpu.scene.animation import AnimatedTransform
from mitsuba_path_guiding_tpu.scene.scenes import look_at
from mitsuba_path_guiding_tpu.scene.transforms import rotate, translate


def test_animated_transform_interpolation():
    a = AnimatedTransform(
        [0.0, 1.0], [translate(0, 0, 0), translate(2.0, 0, 0)]
    )
    m = a.eval(0.25)
    np.testing.assert_allclose(m[:3, 3], [0.5, 0, 0], atol=1e-12)
    # clamped outside range
    np.testing.assert_allclose(a.eval(-1.0)[:3, 3], [0, 0, 0])
    np.testing.assert_allclose(a.eval(9.0)[:3, 3], [2, 0, 0])
    # rotation slerp: half of a 90-degree turn is 45 degrees
    r = AnimatedTransform([0.0, 1.0], [rotate([0, 0, 1], 0.0), rotate([0, 0, 1], 90.0)])
    v = r.eval(0.5)[:3, :3] @ np.array([1.0, 0, 0])
    np.testing.assert_allclose(v, [np.sqrt(0.5), np.sqrt(0.5), 0], atol=1e-7)


def _moving_scene(dx=0.4):
    return {
        "sensor": {
            "type": "perspective", "fov": 60.0,
            "to_world": look_at([0, 0, -4], [0, 0, 0]),
        },
        "shapes": [
            {
                "type": "sphere", "center": [0, 0, 0], "radius": 0.8,
                "sphere_res": 16,
                "animation": {
                    "times": [0.0, 1.0],
                    "transforms": [translate(0, 0, 0), translate(dx, 0, 0)],
                },
                "bsdf": {"type": "diffuse", "reflectance": [0.8] * 3},
            },
            {
                "type": "rectangle", "bsdf": {"type": "diffuse"},
                "to_world": translate(0, 0, 2.0) @ np.diag([4.0, 4.0, 1.0, 1.0]),
            },
        ],
        "emitters": [{"type": "constant", "radiance": [1.0] * 3}],
    }


def test_motion_vectors_point_along_movement():
    mv = np.asarray(
        render_motion(_moving_scene(0.4), RenderConfig(width=24, height=24, spp=1))
    )
    assert np.isfinite(mv).all()
    moving = np.abs(mv[..., 0]) > 0.2
    assert moving.sum() > 10          # the sphere moved on screen
    assert (mv[..., 0][moving] > 0).all()  # +x world motion -> +x film
    assert np.abs(mv[..., 1]).max() < np.abs(mv[..., 0]).max() * 0.2
    # the static background has zero motion
    assert (np.abs(mv[..., 0]) < 1e-5).sum() > mv[..., 0].size * 0.3


def test_motion_blur_smears():
    cfg = RenderConfig(width=24, height=24, spp=8, max_depth=2, seed=1)
    sharp = np.asarray(render_motion_blur(_moving_scene(0.0), cfg, time_bins=2))
    blurred = np.asarray(render_motion_blur(_moving_scene(1.2), cfg, time_bins=6))
    assert np.isfinite(blurred).all()
    # energy roughly conserved, edges softened: the gradient magnitude drops
    gx_s = np.abs(np.diff(sharp.mean(-1), axis=1)).max()
    gx_b = np.abs(np.diff(blurred.mean(-1), axis=1)).max()
    assert gx_b < gx_s * 0.8, (gx_s, gx_b)


def test_deformable_shape_lerp_and_blur():
    """deformable.cpp analogue: keyframed vertex positions lerp per time
    slice; motion blur over the deformation smears."""
    from mitsuba_path_guiding_tpu.scene.animation import deformable_at

    v0 = 0.35 * np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], float)
    v1 = v0 + np.array([1.0, 0.0, 0.0])
    f = np.array([[0, 1, 2], [0, 2, 3]])
    sh = {"type": "deformable", "vertices_frames": [v0, v1], "faces": f,
          "bsdf": {"type": "diffuse", "reflectance": [0.8, 0.2, 0.2]}}
    mid = deformable_at(sh, 0.5)
    np.testing.assert_allclose(mid["vertices"], 0.5 * (v0 + v1))
    assert mid["type"] == "trimesh"

    def scene(shape):
        return {
            "sensor": {"type": "orthographic",
                       "to_world": look_at([0, 0, -3], [0, 0, 0])},
            "shapes": [shape],
            "emitters": [{"type": "constant", "radiance": [1.0] * 3}],
        }

    cfg = RenderConfig(width=24, height=24, spp=8, max_depth=2, seed=0)
    img = np.asarray(render_motion_blur(scene(sh), cfg, time_bins=4))
    sharp_sh = dict(sh, vertices_frames=[v0, v0])
    sharp = np.asarray(render_motion_blur(scene(sharp_sh), cfg, time_bins=2))
    assert np.isfinite(img).all()
    # blur spreads the red plane (red-dominant pixels) over more columns
    cover_blur = (img[..., 0] > 1.5 * img[..., 2]).mean()
    cover_sharp = (sharp[..., 0] > 1.5 * sharp[..., 2]).mean()
    assert cover_blur > cover_sharp, (cover_blur, cover_sharp)
