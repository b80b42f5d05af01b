import sys; sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
import mitsuba_path_guiding_tpu.guiding.fit as F
KMAX = float(sys.argv[1]) if len(sys.argv) > 1 else 50.0
MINV = float(sys.argv[2]) if len(sys.argv) > 2 else 32.0
F.KAPPA_FIT_MAX = KMAX
F.MIN_SAMPLES_VALID = MINV
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
W = H = 128; n_pix = W * H
em_kinds = kinds_present(scene.emitters); mat_types = types_present(scene.mats)
pix = jnp.arange(n_pix, dtype=jnp.int32); key = rng.base_key(0)
grid0 = make_grid(scene.aabb_min, scene.aabb_max, res=16, n_lobes=8)
levels = active_levels(grid0)
PARA = sys.argv[3] == "1" if len(sys.argv) > 3 else True
guide = make_guide_fn(0.5, mat_types, levels=levels, min_rough=0.3,
                      parallax=PARA)

@partial(jax.jit, static_argnames=("guided", "fit", "n_w"))
def waves(rgbw, grid, w0, guided=False, fit=False, n_w=1):
    def body(carry, w_idx):
        rgbw, grid, _ = carry
        rkeys = rng.ray_keys(key, pix, jnp.full((n_pix,), w_idx, jnp.int32))
        u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2)
        o, d, _ = generate_rays(scene.sensor, W, H, pix, u_cam)
        L, aux, rec = trace(scene, o, d, rkeys, max_depth=5,
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

ref_w, _ = waves(film(), grid0, jnp.int32(200), n_w=64)
ref_w, _ = waves(ref_w, grid0, jnp.int32(264), n_w=64)
ref = img_of(ref_w)
un, _ = waves(film(), grid0, jnp.int32(500), n_w=8)
r_u = robust_relmse(img_of(un), ref)
_, grid = waves(film(), grid0, jnp.int32(0), guided=True, fit=True, n_w=32)
g, _ = waves(film(), grid, jnp.int32(500), guided=True, n_w=8)
r_g = robust_relmse(img_of(g), ref)
print(f"KMAX={KMAX} MINV={MINV} parallax={PARA}: unguided {r_u:.3f} guided {r_g:.3f} "
      f"gain {r_u/max(r_g,1e-9):.2f}x", flush=True)

# --- bias check: guided at 64 spp should converge to ref if unbiased
g64, _ = waves(film(), grid, jnp.int32(600), guided=True, n_w=64)
g64 = img_of(g64)
un64, _ = waves(film(), grid0, jnp.int32(600), n_w=64)
un64 = img_of(un64)
print(f"means: ref {ref.mean():.4f} unguided64 {un64.mean():.4f} "
      f"guided64 {g64.mean():.4f}", flush=True)
print(f"relMSE@64spp: unguided {robust_relmse(un64, ref):.4f} "
      f"guided {robust_relmse(g64, ref):.4f}", flush=True)
# per-region (dark room vs bright) at 8 spp
img_u, img_g = img_of(un), img_of(g)
lum = ref.mean(-1)
dark = lum < np.quantile(lum, 0.5)
for name, m in [("dark", dark), ("bright", ~dark)]:
    eps = (0.1 * ref.mean()) ** 2
    eu = ((img_u - ref) ** 2 / (ref ** 2 + eps)).mean(-1)[m]
    eg = ((img_g - ref) ** 2 / (ref ** 2 + eps)).mean(-1)[m]
    print(f"{name}: unguided {np.sort(eu)[:int(eu.size*.999)].mean():.3f} "
          f"guided {np.sort(eg)[:int(eg.size*.999)].mean():.3f}", flush=True)
