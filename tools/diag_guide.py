import sys; sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA
from mitsuba_path_guiding_tpu.film.film import splat_box_aligned
from mitsuba_path_guiding_tpu.guiding.fit import accumulate_stats, update_grid
from mitsuba_path_guiding_tpu.guiding.grid import active_levels, make_grid, cell_index
from mitsuba_path_guiding_tpu.guiding.sampler import make_guide_fn
from mitsuba_path_guiding_tpu.integrators.path import trace
from mitsuba_path_guiding_tpu.models.bsdf import types_present
from mitsuba_path_guiding_tpu.models.emitter import kinds_present
from mitsuba_path_guiding_tpu.models.sensor import generate_rays
from mitsuba_path_guiding_tpu.scene.builder import build_scene

which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
if which == "door":
    from mitsuba_path_guiding_tpu.scene.scenes import door_room
    scene = build_scene(door_room(140_000))
else:
    from mitsuba_path_guiding_tpu.scene.scenes import cornell_box
    scene = build_scene(cornell_box())
W = H = 128
n_pix = W * H
MAX_DEPTH = 5
em_kinds = kinds_present(scene.emitters)
mat_types = types_present(scene.mats)
pix = jnp.arange(n_pix, dtype=jnp.int32)
key = rng.base_key(0)
grid0 = make_grid(scene.aabb_min, scene.aabb_max, res=16, n_lobes=8)
levels = active_levels(grid0)
guide = make_guide_fn(0.5, mat_types, levels=levels, min_rough=0.3)

@partial(jax.jit, static_argnames=("guided", "fit", "n_w"))
def waves(rgbw, grid, w0, guided=False, fit=False, n_w=1):
    def body(carry, w_idx):
        rgbw, grid, _ = carry
        rkeys = rng.ray_keys(key, pix, jnp.full((n_pix,), w_idx, jnp.int32))
        u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2)
        o, d, _ = generate_rays(scene.sensor, W, H, pix, u_cam)
        L, aux, rec = trace(scene, o, d, rkeys, max_depth=MAX_DEPTH,
            guide=guide if guided else None, guide_state=grid if guided else None,
            record_paths=fit, em_kinds=em_kinds, mat_types=mat_types)
        rgbw = splat_box_aligned(rgbw, L, n_pix)
        if fit:
            grid = update_grid(grid, *accumulate_stats(grid, rec, levels=levels))
        return (rgbw, grid, 0), None
    (rgbw, grid, _), _ = jax.lax.scan(body, (rgbw, grid, 0), w0 + jnp.arange(n_w, dtype=jnp.int32))
    return rgbw, grid

def film(): return jnp.zeros((n_pix, 4), jnp.float32)
def img_of(r):
    a = np.asarray(r); return a[:, :3] / np.maximum(a[:, 3:4], 1e-9)
def robust_relmse(img, ref):
    eps = (0.1 * ref.mean()) ** 2
    e = ((img - ref) ** 2 / (ref ** 2 + eps)).ravel()
    return float(np.sort(e)[:int(e.size * 0.999)].mean())

# train
_, grid = waves(film(), grid0, jnp.int32(0), guided=True, fit=True, n_w=32)
print("valid cells:", int(np.asarray(grid.valid).sum()), flush=True)

# quality on this scene
ref_w, _ = waves(film(), grid0, jnp.int32(200), n_w=64)
ref_w, _ = waves(ref_w, grid0, jnp.int32(264), n_w=64)
ref = img_of(ref_w)
un, _ = waves(film(), grid0, jnp.int32(500), n_w=8)
g, _ = waves(film(), grid, jnp.int32(500), guided=True, n_w=8)
r_u, r_g = robust_relmse(img_of(un), ref), robust_relmse(img_of(g), ref)
print(f"{which}: unguided {r_u:.4f} guided {r_g:.4f} gain {r_u/max(r_g,1e-9):.2f}x", flush=True)

# inspect a trained cell
if which == "door":
    p = jnp.asarray([[0.0, 1.2, -1.5]], jnp.float32)   # mid dark room
    target = np.asarray([1.2, 1.2, 1.0]) - np.asarray([0.0, 1.2, -1.5])  # door gap approx
else:
    p = jnp.asarray([[0.0, -0.9, 0.0]], jnp.float32)   # floor center
    target = np.asarray([0.0, 0.99, 0.0]) - np.asarray([0.0, -0.9, 0.0])  # light
target = target / np.linalg.norm(target)
cid = cell_index(grid, p, levels=levels)
i = int(np.asarray(cid)[0])
mu = np.asarray(grid.mu[i]); wl = np.exp(np.asarray(grid.log_weight[i])); wl = wl / wl.sum(); kap = np.asarray(grid.kappa[i])
print("cell", i, "valid", bool(np.asarray(grid.valid)[i]))
for l in range(mu.shape[0]):
    print(f"  lobe {l}: w={wl[l]:.3f} kappa={kap[l]:.1f} mu={mu[l].round(2)} cos(target)={float(mu[l] @ target):+.2f}")
