"""A/B for the bf16 pair-data knob (ops/intersect_pairs.py
PAIR_DATA_BF16): door_room 512^2 depth-5 NEE, same shape as bench.py's
big-scene stage.  Run once per setting:

    PAIR_DATA_BF16=0 python tools/ab_bf16_pairs.py /tmp/ab_f32.npy
    PAIR_DATA_BF16=1 python tools/ab_bf16_pairs.py /tmp/ab_bf16.npy

The second run diffs its image against the first file if present.
"""
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA
from mitsuba_path_guiding_tpu.film.film import splat_box_aligned
from mitsuba_path_guiding_tpu.integrators.path import trace
from mitsuba_path_guiding_tpu.models.bsdf import types_present
from mitsuba_path_guiding_tpu.models.emitter import kinds_present
from mitsuba_path_guiding_tpu.models.sensor import generate_rays
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import door_room


def _sync(x):
    float(jnp.max(jnp.abs(x[:64])))


def main(out_path):
    from mitsuba_path_guiding_tpu.ops import intersect_pairs as ip

    print("PAIR_DATA_BF16:", ip.PAIR_DATA_BF16)
    t0 = time.time()
    scene = build_scene(door_room(250_000))
    print(f"build {time.time() - t0:.1f}s, {int(scene.geo.p0.shape[0])} tris")
    W = H = 512
    n_pix = W * H
    em_kinds = kinds_present(scene.emitters)
    mat_types = types_present(scene.mats)
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    key = rng.base_key(0)
    n_waves = 8

    @partial(jax.jit, donate_argnums=(0,))
    def waves(rgbw):
        def body(carry, w_idx):
            rgbw, segs = carry
            rkeys = rng.ray_keys(key, pix, jnp.full_like(pix, 0) + w_idx)
            u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2)
            o, d, _ = generate_rays(scene.sensor, W, H, pix, u_cam)
            L, aux, _ = trace(scene, o, d, rkeys, max_depth=5,
                              em_kinds=em_kinds, mat_types=mat_types)
            rgbw = splat_box_aligned(rgbw, L, n_pix)
            return (rgbw, segs + jnp.sum(aux.n_bounces)), None

        (rgbw, segs), _ = jax.lax.scan(
            body, (rgbw, jnp.int32(0)), jnp.arange(n_waves, dtype=jnp.int32))
        return rgbw, segs

    rgbw = jnp.zeros((n_pix, 4), jnp.float32)
    t0 = time.time()
    rgbw, segs = waves(rgbw)
    _sync(rgbw)
    print(f"compile+first: {time.time() - t0:.1f}s")
    best = None
    for rep in range(3):
        t0 = time.time()
        rgbw, segs = waves(rgbw)
        _sync(rgbw)
        dt = time.time() - t0
        mrays = int(segs) * 2 / dt / 1e6
        best = mrays if best is None else max(best, mrays)
        print(f"rep {rep}: {n_waves} waves in {dt:.2f}s -> {mrays:.2f} Mrays/s")
    img = np.asarray(rgbw[:, :3]) / np.maximum(np.asarray(rgbw[:, 3:]), 1)
    print(f"BEST {best:.2f} Mrays/s, img mean {img.mean():.5f}")
    np.save(out_path, img)
    other = "/tmp/ab_f32.npy"
    if out_path != other and os.path.exists(other):
        ref = np.load(other)
        d = np.abs(img - ref)
        rel = d.mean() / max(ref.mean(), 1e-9)
        print(f"diff vs f32: mean-abs {d.mean():.2e}, rel {rel*100:.3f}%, "
              f"pixels>1% {(d.max(-1) > 0.01 * max(ref.mean(),1e-9)).mean()*100:.2f}%")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_f32.npy")
