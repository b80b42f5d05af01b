"""Headline-stage-only bench (fast iteration on the hot-math refactor).

Mirrors bench.py's single-chip headline stage exactly: Cornell 256x256
depth-5 guided trace, 16-wave scanned dispatch, best of 3 windows.
Usage: timeout 900 python tools/bench_headline.py [--unguided]
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA
from mitsuba_path_guiding_tpu.film.film import splat_box_aligned
from mitsuba_path_guiding_tpu.guiding.fit import accumulate_stats, update_grid
from mitsuba_path_guiding_tpu.guiding.grid import make_grid, active_levels
from mitsuba_path_guiding_tpu.guiding.sampler import make_guide_fn
from mitsuba_path_guiding_tpu.integrators.path import trace
from mitsuba_path_guiding_tpu.models.bsdf import types_present
from mitsuba_path_guiding_tpu.models.emitter import kinds_present
from mitsuba_path_guiding_tpu.models.sensor import generate_rays
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import cornell_box

unguided = "--unguided" in sys.argv
ACCEL = "pallas" if "--pallas" in sys.argv else "auto"
scene = build_scene(cornell_box())
W = H = 256
MAX_DEPTH = 5
SPP_PER_WAVE = 8
em_kinds = kinds_present(scene.emitters)
mat_types = types_present(scene.mats)
grid = make_grid(scene.aabb_min, scene.aabb_max, res=16, n_lobes=8)
levels = active_levels(grid)
guide = None if unguided else make_guide_fn(0.5, mat_types, levels=levels)
N_WAVES = 16
n_pix = W * H
pix = jnp.tile(jnp.arange(n_pix, dtype=jnp.int32), SPP_PER_WAVE)
key = rng.base_key(0)

def _one_wave(rgbw, grid, wave_idx, fit):
    sidx = jnp.repeat(jnp.arange(SPP_PER_WAVE, dtype=jnp.int32), n_pix) + wave_idx * SPP_PER_WAVE
    rkeys = rng.ray_keys(key, pix, sidx)
    u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2)
    o, d, film_xy = generate_rays(scene.sensor, W, H, pix, u_cam)
    L, aux, rec = trace(scene, o, d, rkeys, max_depth=MAX_DEPTH, use_bvh=False,
                        guide=guide, guide_state=grid, record_paths=fit, accel=ACCEL,
                        em_kinds=em_kinds, mat_types=mat_types)
    rgbw = splat_box_aligned(rgbw, L, n_pix)
    if fit:
        grid = update_grid(grid, *accumulate_stats(grid, rec, levels=levels))
    return rgbw, grid, jnp.sum(aux.n_bounces)

@partial(jax.jit, static_argnames=("fit", "n_waves"), donate_argnums=(0,))
def _waves_jit(rgbw, grid, wave0, fit=True, n_waves=1):
    def body(carry, i):
        rgbw, grid, segs = carry
        rgbw, grid, n_seg = _one_wave(rgbw, grid, wave0 + i, fit)
        return (rgbw, grid, segs + n_seg), None
    (rgbw, grid, segs), _ = jax.lax.scan(body, (rgbw, grid, jnp.int32(0)),
                                         jnp.arange(n_waves, dtype=jnp.int32))
    return rgbw, grid, segs

rgbw = jnp.zeros((n_pix, 4), jnp.float32)
t0 = time.time()
rgbw, grid, _ = _waves_jit(rgbw, grid, jnp.int32(0), fit=not unguided, n_waves=4)
float(jnp.max(rgbw))
print(f"compile+4 train: {time.time()-t0:.1f}s")
rgbw, _, _ = _waves_jit(rgbw, grid, jnp.int32(4), fit=False, n_waves=N_WAVES)
float(jnp.max(rgbw))
best = None; seg_total = 0
for w in range(3):
    t0 = time.time()
    rgbw, _, n_seg = _waves_jit(rgbw, grid, jnp.int32(5 + w * N_WAVES), fit=False, n_waves=N_WAVES)
    float(jnp.max(rgbw))
    dt = time.time() - t0
    print(f"window {w}: {dt:.3f}s")
    if best is None or dt < best:
        best, seg_total = dt, int(n_seg)
mrays = seg_total * 2 / best / 1e6
img = np.asarray(rgbw[:, :3] / np.maximum(np.asarray(rgbw[:, 3:4]), 1e-8))
assert np.isfinite(img).all()
print(f"HEADLINE {'unguided' if unguided else 'guided'}: {mrays:.2f} Mrays/s  (img mean {img.mean():.5f})")
