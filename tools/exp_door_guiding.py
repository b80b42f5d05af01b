"""Door-room guiding quality matrix (VERDICT r4 item 3).

Measures equal-spp (4) relMSE gain vs a 32-spp unguided reference for a
matrix of guiding configs: training spp, spatial refinement, product
sampling, parallax reprojection.  256x256 for iteration speed (the bench
runs 512x512).  One long-lived process; each config recompiles only when
its guide closure or levels change.

Usage: timeout 3000 python tools/exp_door_guiding.py [configs...]
  default configs: base t16 refine product parallax t32
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

from mitsuba_path_guiding_tpu.core import rng
from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA
from mitsuba_path_guiding_tpu.film.film import splat_box_aligned
from mitsuba_path_guiding_tpu.guiding.fit import accumulate_stats, refine_grid, update_grid
from mitsuba_path_guiding_tpu.guiding.grid import MAX_REFINE_LEVELS, active_levels, make_grid
from mitsuba_path_guiding_tpu.guiding.sampler import make_guide_fn
from mitsuba_path_guiding_tpu.integrators.path import trace
from mitsuba_path_guiding_tpu.models.bsdf import types_present
from mitsuba_path_guiding_tpu.models.emitter import kinds_present
from mitsuba_path_guiding_tpu.models.sensor import generate_rays
from mitsuba_path_guiding_tpu.scene.builder import build_scene
from mitsuba_path_guiding_tpu.scene.scenes import door_room

t0 = time.time()
scene = build_scene(door_room(250_000))
print(f"scene: {int(scene.geo.p0.shape[0])} tris, build {time.time()-t0:.1f}s", flush=True)
W = H = 256
MAX_DEPTH = 5
n_pix = W * H
ek = kinds_present(scene.emitters)
mt = types_present(scene.mats)
pix = jnp.arange(n_pix, dtype=jnp.int32)
key = rng.base_key(0)


def make_waves(guide, levels):
    @partial(jax.jit, static_argnames=("guided", "fit", "n_w"))
    def waves(rgbw, grid, w0, guided=False, fit=False, n_w=1):
        def body(carry, w_idx):
            rgbw, grid, segs = carry
            rk = rng.ray_keys(key, pix, jnp.full((n_pix,), w_idx, jnp.int32))
            u_cam = rng.event_uniform(rk, TAG_CAMERA, 2)
            o, d, _ = generate_rays(scene.sensor, W, H, pix, u_cam)
            L, aux, rec = trace(scene, o, d, rk, max_depth=MAX_DEPTH,
                                guide=guide if guided else None,
                                guide_state=grid if guided else None,
                                record_paths=fit, em_kinds=ek, mat_types=mt)
            rgbw = splat_box_aligned(rgbw, L, n_pix)
            if fit:
                grid = update_grid(grid, *accumulate_stats(grid, rec, levels=levels))
            return (rgbw, grid, segs + jnp.sum(aux.n_bounces)), None
        (rgbw, grid, segs), _ = jax.lax.scan(
            body, (rgbw, grid, jnp.int32(0)), w0 + jnp.arange(n_w, dtype=jnp.int32))
        return rgbw, grid, segs
    return waves


def film():
    return jnp.zeros((n_pix, 4), jnp.float32)


def img_of(r):
    a = np.asarray(r)
    return a[:, :3] / np.maximum(a[:, 3:4], 1e-9)


# shared reference + unguided 4spp
base_grid = make_grid(scene.aabb_min, scene.aabb_max, res=16, n_lobes=8)
w_un = make_waves(None, 0)
t0 = time.time()
ref_rgbw, _, _ = w_un(film(), base_grid, jnp.int32(200), n_w=32)
ref = img_of(ref_rgbw)
print(f"ref 32spp: {time.time()-t0:.1f}s", flush=True)
un4 = img_of(w_un(film(), base_grid, jnp.int32(600), n_w=4)[0])


def relmse(img):
    eps = (0.1 * float(ref.mean())) ** 2
    return float(np.mean((img - ref) ** 2 / (ref ** 2 + eps)))


r_un = relmse(un4)
print(f"unguided 4spp relMSE: {r_un:.4f}", flush=True)

CONFIGS = {
    # name: (train_spp, refine_every, guide_kwargs)
    "base":     (8,  0, dict(min_rough=0.3)),
    "t16":      (16, 0, dict(min_rough=0.3)),
    "t32":      (32, 0, dict(min_rough=0.3)),
    "refine":   (16, 8, dict(min_rough=0.3)),
    "product":  (16, 0, dict(min_rough=0.3, product=True)),
    "parallax": (16, 0, dict(min_rough=0.3, parallax=True)),
    "nogate":   (16, 0, dict(min_rough=0.0)),
    "a7":       (16, 0, dict(min_rough=0.3)),  # alpha=0.7
    "refine_t32": (32, 8, dict(min_rough=0.3)),
    "rt16": (16, 8, dict(min_rough=0.3)),   # refine @ threshold 512
    "rt32": (32, 8, dict(min_rough=0.3)),
    "rt32_lo1": (32, 8, dict(min_rough=0.3)),  # gentler alpha ramp
    "rt32_a7": (32, 8, dict(min_rough=0.3)),   # alpha = 0.7
}

names = sys.argv[1:] or ["base", "t16", "t32", "refine", "product", "parallax"]
results = {}
for name in names:
    import mitsuba_path_guiding_tpu.guiding.fit as fitmod
    if name == "rt32_lo1":
        fitmod.ALPHA_R_LO, fitmod.ALPHA_R_HI = 0.1, 0.5
        jax.clear_caches()
    elif name == "rt32_a7":
        pass
    train_spp, refine_every, gkw = CONFIGS[name]
    alpha = 0.7 if name in ("a7", "rt32_a7") else 0.5
    t0 = time.time()
    cap = 4 if refine_every else 1
    grid = make_grid(scene.aabb_min, scene.aabb_max, res=16, n_lobes=8,
                     capacity=cap * 16**3)
    levels = MAX_REFINE_LEVELS if refine_every else 0
    guide = make_guide_fn(alpha, mt, levels=levels, **gkw)
    w_g = make_waves(guide, levels)
    done = 0
    while done < train_spp:
        step = min(refine_every or train_spp, train_spp - done)
        _, grid, _ = w_g(film(), grid, jnp.int32(done), guided=True,
                         fit=True, n_w=step)
        done += step
        if refine_every and done < train_spp:
            thr = 512.0 if name.startswith("rt") else None
            grid = refine_grid(grid, *( [thr] if thr else [] ))
            print(f"  [{name}] refined: {int(np.asarray(grid.n_used))} cells",
                  flush=True)
    g4 = img_of(w_g(film(), grid, jnp.int32(600), guided=True, n_w=4)[0])
    r_g = relmse(g4)
    results[name] = r_g
    print(f"[{name}] train {train_spp}spp, {time.time()-t0:.1f}s: guided "
          f"relMSE {r_g:.4f}, gain {r_un/max(r_g,1e-9):.2f}x", flush=True)

print("\n=== summary (gain = unguided/guided relMSE at 4 spp) ===")
for name, r in results.items():
    print(f"  {name:10s} {r_un/max(r,1e-9):.2f}x  (relMSE {r:.4f})")
