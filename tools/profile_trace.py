"""Marginal-cost timing of full trace waves (dev tool).

The axon tunnel adds ~24 ms of fixed overhead per blocking dispatch (see
git log / NEXT.md); timing one call measures mostly that.  Here each
variant runs as a lax.scan of REPS chained waves inside ONE dispatch, and
the reported number is the marginal cost per wave:
  (time(REPS) - time(1)) / (REPS - 1)
Run: python tools/profile_trace.py [n_lanes_log2]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPS = 8


def marginal(name, make_wave, o, d):
    """make_wave: (o, d) -> L (N,3).  Chains waves via o-perturbation."""

    def body(carry, _):
        oo, acc = carry
        L = make_wave(oo, d)
        # feed a tiny function of L back into the next wave's origins so
        # the scan iterations are truly sequential (no CSE/overlap)
        eps = jnp.sum(L) * 1e-30
        return (oo + eps, acc + jnp.sum(L)), None

    def run(reps):
        f = jax.jit(
            lambda o: jax.lax.scan(body, (o, jnp.float32(0.0)), None, length=reps)[0][1]
        )
        r = f(o)
        jax.block_until_ready(r)
        t0 = time.time()
        r = f(o)
        jax.block_until_ready(r)
        return time.time() - t0

    t1 = run(1)
    tn = run(REPS)
    dt = (tn - t1) / (REPS - 1)
    print(f"{name:44s} {dt * 1e3:8.2f} ms/wave   (1-shot {t1*1e3:7.1f} ms)", flush=True)
    return dt


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 18)
    print(f"devices: {jax.devices()}  lanes: {n}")

    from mitsuba_path_guiding_tpu.core import rng
    from mitsuba_path_guiding_tpu.guiding.grid import make_grid
    from mitsuba_path_guiding_tpu.guiding.sampler import make_guide_fn
    from mitsuba_path_guiding_tpu.integrators.path import trace
    from mitsuba_path_guiding_tpu.models.bsdf import types_present
    from mitsuba_path_guiding_tpu.models.emitter import kinds_present
    from mitsuba_path_guiding_tpu.models.sensor import generate_rays
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import cornell_box

    scene = build_scene(cornell_box())
    em_kinds = kinds_present(scene.emitters)
    mat_types = types_present(scene.mats)
    key = rng.base_key(0)
    pix = jnp.arange(n, dtype=jnp.int32) % (256 * 256)
    sidx = jnp.zeros_like(pix)
    rkeys = rng.ray_keys(key, pix, sidx)
    u = rng.bounce_uniform(rkeys, 0, 4)
    o, d, _ = generate_rays(scene.sensor, 256, 256, pix, u[..., 0:2], u[..., 2:4])
    grid = make_grid(scene.aabb_min, scene.aabb_max, res=16, n_lobes=8)
    guide = make_guide_fn(0.5, mat_types, levels=0)

    common = dict(
        max_depth=5, rr_depth=5, em_kinds=em_kinds, mat_types=mat_types,
        use_bvh=False,
    )

    marginal(
        "trace depth5 NEE unguided",
        lambda o, d: trace(scene, o, d, rkeys, use_nee=True, **common)[0],
        o, d,
    )
    marginal(
        "trace depth5 noNEE unguided",
        lambda o, d: trace(scene, o, d, rkeys, use_nee=False, **common)[0],
        o, d,
    )
    marginal(
        "trace depth5 NEE guided",
        lambda o, d: trace(
            scene, o, d, rkeys, use_nee=True, guide=guide, guide_state=grid, **common
        )[0],
        o, d,
    )
    marginal(
        "trace depth5 NEE guided+records",
        lambda o, d: trace(
            scene, o, d, rkeys, use_nee=True, guide=guide, guide_state=grid,
            record_paths=True, **common
        )[0],
        o, d,
    )


if __name__ == "__main__":
    main()
