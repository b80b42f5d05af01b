import sys; sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA
from mitsuba_path_guiding_tpu.film.film import splat_box_aligned
from mitsuba_path_guiding_tpu.guiding.fit import accumulate_stats, update_grid
from mitsuba_path_guiding_tpu.guiding.grid import (active_levels, make_grid,
    cell_index, _gather_cells, _mixture_sample, _mixture_pdf)
from mitsuba_path_guiding_tpu.guiding.sampler import make_guide_fn
from mitsuba_path_guiding_tpu.integrators.path import trace
from mitsuba_path_guiding_tpu.models.bsdf import types_present
from mitsuba_path_guiding_tpu.models.emitter import kinds_present
from mitsuba_path_guiding_tpu.models.sensor import generate_rays
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import door_room

scene = build_scene(door_room(140_000))
W = H = 128
n_pix = W * H
em_kinds = kinds_present(scene.emitters)
mat_types = types_present(scene.mats)
pix = jnp.arange(n_pix, dtype=jnp.int32)
key = rng.base_key(0)
grid0 = make_grid(scene.aabb_min, scene.aabb_max, res=16, n_lobes=8)
levels = active_levels(grid0)
guide = make_guide_fn(0.5, mat_types, levels=levels, min_rough=0.3)

@partial(jax.jit, static_argnames=("fit", "n_w"))
def waves(rgbw, grid, w0, fit=False, n_w=1):
    def body(carry, w_idx):
        rgbw, grid, _ = carry
        rkeys = rng.ray_keys(key, pix, jnp.full((n_pix,), w_idx, jnp.int32))
        u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2)
        o, d, _ = generate_rays(scene.sensor, W, H, pix, u_cam)
        L, aux, rec = trace(scene, o, d, rkeys, max_depth=5,
            guide=guide, guide_state=grid,
            record_paths=fit, em_kinds=em_kinds, mat_types=mat_types)
        rgbw = splat_box_aligned(rgbw, L, n_pix)
        if fit:
            grid = update_grid(grid, *accumulate_stats(grid, rec, levels=levels))
        return (rgbw, grid, 0), None
    (rgbw, grid, _), _ = jax.lax.scan(body, (rgbw, grid, 0), w0 + jnp.arange(n_w, dtype=jnp.int32))
    return rgbw, grid

_, grid = waves(jnp.zeros((n_pix,4)), grid0, jnp.int32(0), fit=True, n_w=32)
print("valid cells:", int(np.asarray(grid.valid).sum()), flush=True)

# door_room geometry: front room x[-3,3] y[0,3] z[-4,1]; door gap near z=1.
# probe the front-room floor center
for pt, name in [([0.0, 0.02, -1.5], "front floor"),
                 ([-2.9, 1.5, -1.5], "front left wall"),
                 ([0.0, 1.5, -3.9], "front back wall")]:
    p = jnp.asarray([pt], jnp.float32)
    cid = cell_index(grid, p, levels=levels)
    i = int(np.asarray(cid)[0])
    sc = float(np.asarray(grid.s_count)[i])
    va = bool(np.asarray(grid.valid)[i])
    mu = np.asarray(grid.mu[i]); kap = np.asarray(grid.kappa[i])
    wl = np.exp(np.asarray(grid.log_weight[i])); wl /= wl.sum()
    # door direction (door is an opening near x~1, z=1 per scenes.py; just
    # report the dominant lobe)
    j = int(wl.argmax())
    print(f"{name}: cell {i} valid={va} count={sc:.0f} "
          f"top lobe w={wl[j]:.2f} kappa={kap[j]:.1f} mu={mu[j].round(2)}",
          flush=True)
    # below-horizon fraction of guided samples at this point (normal +y)
    params = _gather_cells(grid, jnp.full((4096,), i, jnp.int32))
    u = jax.random.uniform(jax.random.PRNGKey(0), (4096, 2))
    ul = jax.random.uniform(jax.random.PRNGKey(1), (4096,))
    d = np.asarray(_mixture_sample(params, ul, u))
    print(f"   guided sample up-fraction (floor normal +y): "
          f"{(d[:,1] > 0).mean():.2f}", flush=True)
