import sys; sys.path.insert(0, ".")
import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA
from mitsuba_path_guiding_tpu.film.film import splat_box_aligned
from mitsuba_path_guiding_tpu.integrators.path import trace
from mitsuba_path_guiding_tpu.models.bsdf import types_present
from mitsuba_path_guiding_tpu.models.emitter import kinds_present
from mitsuba_path_guiding_tpu.models.sensor import generate_rays
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import door_room

scene = build_scene(door_room(250_000))
W = H = 512; MAX_DEPTH = 5
n_pix = W * H
em_kinds = kinds_present(scene.emitters)
mat_types = types_present(scene.mats)
pix = jnp.arange(n_pix, dtype=jnp.int32)
key = rng.base_key(0)

@jax.jit
def wave(rgbw, w_idx):
    sidx = jnp.full((n_pix,), w_idx, jnp.int32)
    rkeys = rng.ray_keys(key, pix, sidx)
    u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2)
    o, d, _ = generate_rays(scene.sensor, W, H, pix, u_cam)
    L, aux, _ = trace(scene, o, d, rkeys, max_depth=MAX_DEPTH,
                      em_kinds=em_kinds, mat_types=mat_types)
    return splat_box_aligned(rgbw, L, n_pix)

rgbw = jnp.zeros((n_pix, 4), jnp.float32)
rgbw = wave(rgbw, 0); jax.block_until_ready(rgbw); float(jnp.max(rgbw))
jax.profiler.start_trace("/tmp/trace_door")
for i in range(3):
    rgbw = wave(rgbw, i + 1)
float(jnp.max(rgbw))
jax.profiler.stop_trace()
print("done")
