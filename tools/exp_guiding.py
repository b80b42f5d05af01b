"""Guided-vs-unguided equal-spp quality on door_room at small scale:
sweep training budget / guide variants, robust metric."""
import sys; sys.path.insert(0, ".")
import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA
from mitsuba_path_guiding_tpu.film.film import splat_box_aligned
from mitsuba_path_guiding_tpu.guiding.fit import accumulate_stats, update_grid
from mitsuba_path_guiding_tpu.guiding.grid import active_levels, make_grid
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
MAX_DEPTH = 5
em_kinds = kinds_present(scene.emitters)
mat_types = types_present(scene.mats)
pix = jnp.arange(n_pix, dtype=jnp.int32)
key = rng.base_key(0)

def make_waves(guide, levels):
    @partial(jax.jit, static_argnames=("guided", "fit", "n_w"))
    def waves(rgbw, grid, w0, guided=False, fit=False, n_w=1):
        def body(carry, w_idx):
            rgbw, grid, _ = carry
            rkeys = rng.ray_keys(key, pix, jnp.full((n_pix,), w_idx, jnp.int32))
            u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2)
            o, d, _ = generate_rays(scene.sensor, W, H, pix, u_cam)
            L, aux, rec = trace(scene, o, d, rkeys, max_depth=MAX_DEPTH,
                guide=guide if guided else None,
                guide_state=grid if guided else None,
                record_paths=fit, em_kinds=em_kinds, mat_types=mat_types)
            rgbw = splat_box_aligned(rgbw, L, n_pix)
            if fit:
                grid = update_grid(grid, *accumulate_stats(grid, rec, levels=levels))
            return (rgbw, grid, 0), None
        (rgbw, grid, _), _ = jax.lax.scan(body, (rgbw, grid, 0), w0 + jnp.arange(n_w, dtype=jnp.int32))
        return rgbw, grid
    return waves

def film(): return jnp.zeros((n_pix, 4), jnp.float32)
def img_of(rgbw):
    a = np.asarray(rgbw); return a[:, :3] / np.maximum(a[:, 3:4], 1e-9)

def robust_relmse(img, ref):
    eps = (0.1 * ref.mean()) ** 2
    e = ((img - ref) ** 2 / (ref ** 2 + eps)).ravel()
    k = int(e.size * 0.999)  # reject top 0.1% outliers
    return float(np.sort(e)[:k].mean())

grid0 = make_grid(scene.aabb_min, scene.aabb_max, res=16, n_lobes=8)
levels = active_levels(grid0)

# reference + unguided 8spp
gplain = make_guide_fn(0.5, mat_types, levels=levels, min_rough=0.3)
waves = make_waves(gplain, levels)
t0=time.time()
ref_w, _ = waves(film(), grid0, jnp.int32(0), n_w=128)
ref = img_of(ref_w); print(f"ref 128spp: {time.time()-t0:.0f}s", flush=True)
un8, _ = waves(film(), grid0, jnp.int32(1000), n_w=8)
un8 = img_of(un8)
r_un = robust_relmse(un8, ref)
print(f"unguided 8spp relMSE {r_un:.4f}", flush=True)

for name, kw, train_w in [
    ("gated a.5 t16",  dict(min_rough=0.3), 16),
    ("gated a.5 t64",  dict(min_rough=0.3), 64),
    ("gated product t64", dict(min_rough=0.3, product=True), 64),
    ("gated parallax t64", dict(min_rough=0.3, parallax=True), 64),
    ("ungated a.5 t64", dict(), 64),
]:
    g = make_guide_fn(0.5, mat_types, levels=levels, **kw)
    wv = make_waves(g, levels)
    _, grid = wv(film(), grid0, jnp.int32(0), guided=True, fit=True, n_w=train_w)
    g8, _ = wv(film(), grid, jnp.int32(1000), guided=True, n_w=8)
    r_g = robust_relmse(img_of(g8), ref)
    print(f"{name}: guided 8spp relMSE {r_g:.4f}  gain {r_un/max(r_g,1e-9):.2f}x", flush=True)
