"""Component ablation timings on the current accelerator (dev tool).

Times isolated pieces of the render wave to locate the bottleneck:
RNG generation, intersection, BSDF stack, emitter NEE, guiding, full trace.
Run on the real chip: python tools/ablate.py [n_lanes_log2]
"""
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:40s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 18)
    print(f"devices: {jax.devices()}  lanes: {n}")

    from mitsuba_path_guiding_tpu.core import rng
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import cornell_box
    from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute, intersect_bvh, occluded
    from mitsuba_path_guiding_tpu.models import bsdf as bsdf_mod
    from mitsuba_path_guiding_tpu.models import emitter as em_mod
    from mitsuba_path_guiding_tpu.models.sensor import generate_rays
    from mitsuba_path_guiding_tpu.integrators.path import trace
    from mitsuba_path_guiding_tpu.guiding.grid import make_grid, cell_index, guide_pdf, guide_sample
    from mitsuba_path_guiding_tpu.guiding.sampler import make_guide_fn
    from mitsuba_path_guiding_tpu.core.math import Frame, normalize
    from mitsuba_path_guiding_tpu.models.bsdf import types_present
    from mitsuba_path_guiding_tpu.models.emitter import kinds_present

    scene = build_scene(cornell_box())
    em_kinds = kinds_present(scene.emitters)
    mat_types = types_present(scene.mats)
    key = rng.base_key(0)
    pix = jnp.arange(n, dtype=jnp.int32) % (256 * 256)
    sidx = jnp.zeros_like(pix)

    # --- RNG
    rkeys = rng.ray_keys(key, pix, sidx)
    f_keys = jax.jit(lambda p, s: rng.ray_keys(key, p, s))
    timeit("ray_keys (fold_in x2)", f_keys, pix, sidx)
    f_unif = jax.jit(lambda k: rng.bounce_uniform(k, 3, 9))
    timeit("bounce_uniform 9 dims", f_unif, rkeys)

    # --- raygen
    u = rng.bounce_uniform(rkeys, 0, 9)
    f_raygen = jax.jit(
        lambda u: generate_rays(scene.sensor, 256, 256, pix, u[..., 0:2], u[..., 2:4])
    )
    timeit("raygen", f_raygen, u)
    o, d, _ = f_raygen(u)

    # --- intersection
    f_brute = jax.jit(lambda o, d: intersect_brute(scene.geo, o, d))
    timeit("intersect brute (36 tris)", f_brute, o, d)
    if jax.devices()[0].platform == "cpu":
        f_bvh = jax.jit(lambda o, d: intersect_bvh(scene.geo, scene.bvh, o, d))
        timeit("intersect BVH", f_bvh, o, d)
    else:
        print("intersect BVH: SKIPPED (vmapped while_loop faults on TPU)")
    hit = f_brute(o, d)

    # --- shading prep + BSDF stack
    prim = jnp.maximum(hit.prim, 0)
    mid = scene.geo.mat_id[prim]
    p = o + hit.t[..., None] * d
    ns = normalize(jnp.cross(scene.geo.e1[prim], scene.geo.e2[prim]))
    frame = Frame.from_normal(ns)
    wi = frame.to_local(-d)
    f_bsdf_s = jax.jit(lambda wi, u: bsdf_mod.sample(scene.mats, mid, wi, u[..., 3:6], types=mat_types))
    timeit("bsdf.sample (10 families)", f_bsdf_s, wi, u)
    f_bsdf_e = jax.jit(lambda wi: bsdf_mod.eval_pdf(scene.mats, mid, wi, wi, types=mat_types))
    timeit("bsdf.eval_pdf", f_bsdf_e, wi)

    # --- NEE
    f_nee = jax.jit(lambda p, u: em_mod.sample_direct(scene.emitters, scene.geo, p, u[..., 0:3], kinds=em_kinds))
    timeit("emitter.sample_direct", f_nee, p, u)
    ds = f_nee(p, u)
    f_occ = jax.jit(lambda o, d, t: occluded(scene.geo, scene.bvh, o, d, t, use_bvh=False))
    timeit("shadow occlusion (brute)", f_occ, p, ds.direction, ds.distance * 0.99)

    # --- guiding
    grid = make_grid(scene.aabb_min, scene.aabb_max, res=16, n_lobes=8)
    grid = grid._replace(valid=jnp.ones_like(grid.valid))
    cid = cell_index(grid, p)
    f_gpdf = jax.jit(lambda d: guide_pdf(grid, cid, d))
    timeit("guide_pdf (8 lobes)", f_gpdf, d)
    f_gsmp = jax.jit(lambda u: guide_sample(grid, cid, u[..., 6], u[..., 0:2]))
    timeit("guide_sample", f_gsmp, u)

    # --- full traces
    f_tr_none = jax.jit(
        lambda o, d, k: trace(scene, o, d, k, max_depth=5, use_nee=False, use_bvh=False, em_kinds=em_kinds, mat_types=mat_types)[0]
    )
    t_nonee = timeit("trace depth5 noNEE unguided", f_tr_none, o, d, rkeys)
    f_tr = jax.jit(
        lambda o, d, k: trace(scene, o, d, k, max_depth=5, use_nee=True, use_bvh=False, em_kinds=em_kinds, mat_types=mat_types)[0]
    )
    t_full = timeit("trace depth5 NEE unguided", f_tr, o, d, rkeys)
    guide = make_guide_fn(0.5, mat_types=mat_types)
    f_trg = jax.jit(
        lambda o, d, k: trace(
            scene, o, d, k, max_depth=5, use_nee=True, use_bvh=False,
            guide=guide, guide_state=grid, em_kinds=em_kinds, mat_types=mat_types,
        )[0]
    )
    t_guided = timeit("trace depth5 NEE guided", f_trg, o, d, rkeys)
    f_trg_rec = jax.jit(
        lambda o, d, k: trace(
            scene, o, d, k, max_depth=5, use_nee=True, use_bvh=False,
            guide=guide, guide_state=grid, record_paths=True,
            em_kinds=em_kinds, mat_types=mat_types,
        )[0]
    )
    timeit("trace depth5 guided+records", f_trg_rec, o, d, rkeys)

    segs = 5 * n  # upper bound
    print(f"\nimplied Mrays/s (2x{segs} rays): noNEE {2*segs/t_nonee/1e6:.1f} "
          f"NEE {2*segs/t_full/1e6:.1f} guided {2*segs/t_guided/1e6:.1f}")


if __name__ == "__main__":
    main()
