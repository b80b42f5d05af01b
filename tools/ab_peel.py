"""A/B the camera-peel pair-list widths on the big scene (real TPU).

Builds door_room once, then for each (PAIR_PEEL, SCAN_PAIR_CFG,
CAM_PAIR_CFG) config clears the jit caches, recompiles the wave loop and
times best-of-3 windows.  Usage: python tools/ab_peel.py
"""
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA
from mitsuba_path_guiding_tpu.film.film import splat_box_aligned
from mitsuba_path_guiding_tpu.integrators import path as path_mod
from mitsuba_path_guiding_tpu.models.bsdf import types_present
from mitsuba_path_guiding_tpu.models.emitter import kinds_present
from mitsuba_path_guiding_tpu.models.sensor import generate_rays
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import door_room

W = H = 512
MAX_DEPTH = 5
N_WAVES = 8


def run_config(scene, name):
    em_kinds = kinds_present(scene.emitters)
    mat_types = types_present(scene.mats)
    n_pix = W * H
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    key = rng.base_key(0)

    @partial(jax.jit, donate_argnums=(0,))
    def waves(rgbw):
        def body(carry, w_idx):
            rgbw, segs = carry
            sidx = jnp.full((n_pix,), 0, jnp.int32) + w_idx
            rkeys = rng.ray_keys(key, pix, sidx)
            u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2)
            o, d, _ = generate_rays(scene.sensor, W, H, pix, u_cam)
            L, aux, _ = path_mod.trace(
                scene, o, d, rkeys, max_depth=MAX_DEPTH,
                em_kinds=em_kinds, mat_types=mat_types,
            )
            rgbw = splat_box_aligned(rgbw, L, n_pix)
            return (rgbw, segs + jnp.sum(aux.n_bounces)), None

        (rgbw, segs), _ = jax.lax.scan(
            body, (rgbw, jnp.int32(0)), jnp.arange(N_WAVES, dtype=jnp.int32)
        )
        return rgbw, segs

    rgbw = jnp.zeros((n_pix, 4), jnp.float32)
    t0 = time.time()
    rgbw, segs = waves(rgbw)
    jax.block_until_ready(rgbw)
    print(f"  [{name}] compile+first: {time.time() - t0:.1f}s", flush=True)
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        rgbw, segs = waves(rgbw)
        jax.block_until_ready(rgbw)
        best = min(best, time.time() - t0)
    mrays = int(segs) * 2 / best / 1e6
    print(f"  [{name}] best window {best:.2f}s -> {mrays:.2f} Mrays/s",
          flush=True)
    return mrays


def main():
    t0 = time.time()
    scene = build_scene(door_room(250_000))
    print(f"scene: {int(scene.geo.p0.shape[0])} tris, "
          f"build {time.time() - t0:.1f}s", flush=True)

    # (name, peel, scan_cfg, cam_cfg, scan_fb_shift).  NOTE: scan_fb > 4
    # requires peel=True — with peel off the ~5%-unproven camera wave
    # runs in-scan and would overflow the shrunken fallback capacity.
    configs = [
        ("peel cam=(12,12) scan L=8 fb4", True, (8, 8), (12, 12), 4),
        ("peel cam=(12,12) scan L=8 fb6", True, (8, 8), (12, 12), 6),
        ("baseline peel=F L=8 fb4", False, (8, 8), (12, 12), 4),
    ]
    for name, peel, scan, cam, fb in configs:
        path_mod.PAIR_PEEL = peel
        path_mod.SCAN_PAIR_CFG = scan
        path_mod.CAM_PAIR_CFG = cam
        path_mod.SCAN_FB_SHIFT = fb
        jax.clear_caches()
        run_config(scene, name)


if __name__ == "__main__":
    main()
