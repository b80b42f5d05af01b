"""Volume photon map + beam radiance estimate (integrators/volphoton.py)
vs volpath in expectation — the reference's photonmapper volume map/BRE
(photonmapper.cpp:695, bre.cpp) cross-checked the way the existing suite
cross-checks photon estimators against forward path tracing."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.integrators.volphoton import (
    beam_estimate,
    build_vol_grid,
    volume_photon_pass,
)
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.transforms import look_at


def _medium_scene(sigma_s=0.6, sigma_a=0.1, g=0.0):
    """Black box filled with homogeneous medium, point light at center."""
    black = {"type": "diffuse", "reflectance": [0.0, 0.0, 0.0]}
    import numpy as np
    from mitsuba_path_guiding_tpu.scene.transforms import rotate, scale, translate

    shapes = []
    for p, r in [
        ((0, 0, -2), rotate([1, 0, 0], 0)),
        ((0, 0, 2), rotate([0, 1, 0], 180)),
        ((-2, 0, 0), rotate([0, 1, 0], 90)),
        ((2, 0, 0), rotate([0, 1, 0], -90)),
        ((0, -2, 0), rotate([1, 0, 0], -90)),
        ((0, 2, 0), rotate([1, 0, 0], 90)),
    ]:
        shapes.append({
            "type": "rectangle",
            "to_world": translate(*p) @ r @ scale(2.0),
            "bsdf": black,
        })
    return {
        "shapes": shapes,
        "emitters": [{"type": "point", "position": [0.0, 0.0, 0.0],
                      "intensity": [4.0, 4.0, 4.0]}],
        "medium": {"sigma_s": [sigma_s] * 3, "sigma_a": [sigma_a] * 3, "g": g},
        "sensor": {"type": "perspective", "fov": 60.0,
                   "to_world": look_at([0, 0, -1.9], [0, 0, 0])},
    }


@pytest.mark.slow
def test_volume_photons_match_volpath():
    scene = build_scene(_medium_scene())

    # ---- photon side
    n_ph = 1 << 16
    n_waves = 6
    r = 0.12
    lo, inv_cell, g = build_vol_grid(scene, r)
    key = rng.base_key(5)
    pos_l, dir_l, pw_l, ok_l = [], [], [], []
    for w in range(n_waves):
        rk = rng.ray_keys(key, jnp.zeros((n_ph,), jnp.int32),
                          jnp.arange(w * n_ph, (w + 1) * n_ph))
        p_, d_, pw_, ok_ = volume_photon_pass(scene, rk, max_depth=6)
        pos_l.append(p_)
        dir_l.append(d_)
        pw_l.append(pw_)
        ok_l.append(ok_)
    ph_pos = jnp.concatenate(pos_l)
    ph_dir = jnp.concatenate(dir_l)
    ph_pw = jnp.concatenate(pw_l)
    ph_ok = jnp.concatenate(ok_l)
    assert float(jnp.mean(ph_ok)) > 0.05  # medium events do happen

    # ---- camera rays through the medium (no surfaces emit/reflect)
    n = 4096
    rs = np.random.default_rng(0)
    o = np.tile(np.array([0.0, 0.0, -1.9], np.float32), (n, 1))
    ang = rs.uniform(-0.45, 0.45, (n, 2))
    d = np.stack([np.sin(ang[:, 0]), np.sin(ang[:, 1]) * 0.3, np.ones(n)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d.astype(np.float32))

    from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute

    hit = intersect_brute(scene.geo, o, d)
    t_seg = jnp.where(hit.valid, hit.t, 4.0)

    taps = jnp.asarray(rs.random((16, n)).astype(np.float32))
    L_beam = beam_estimate(
        scene, o, d, t_seg, taps, ph_pos, ph_dir, ph_pw, ph_ok,
        lo, inv_cell, g, r, n_emitted=n_ph * n_waves, n_taps=16,
    )

    # ---- volpath ground truth on the same rays
    from mitsuba_path_guiding_tpu.integrators.volpath import trace_vol
    from mitsuba_path_guiding_tpu.models.bsdf import types_present
    from mitsuba_path_guiding_tpu.models.emitter import kinds_present

    spp = 24
    acc = jnp.zeros((n, 3))
    for s in range(spp):
        rk = rng.ray_keys(rng.base_key(91), jnp.arange(n), jnp.full((n,), s))
        L, _aux = trace_vol(
            scene, o, d, rk, max_depth=6,
            em_kinds=kinds_present(scene.emitters),
            mat_types=types_present(scene.mats),
        )[:2]
        acc = acc + L
    L_ref = acc / spp

    a = float(jnp.mean(L_beam))
    b = float(jnp.mean(L_ref))
    assert b > 1e-4
    assert abs(a / b - 1.0) < 0.15, (a, b)
