"""Per-op profile of the GUIDED bounce (dev tool).

Each candidate op runs REPS times inside one jitted lax.scan so the
~2.5 ms axon dispatch overhead amortizes away; printed time is per rep.
Run on the real chip: python tools/profile_guide.py [n_lanes_log2]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPS = 20


def timeit(name, fn, *args):
    """fn maps args -> pytree; we scan it REPS times chained on a dummy."""

    def body(carry, _):
        out = fn(*args)
        # fold a scalar of out into carry so the loop isn't DCE'd
        s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(out))
        return carry + s, None

    f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)[0])
    r = f()
    jax.block_until_ready(r)
    t0 = time.time()
    r = f()
    jax.block_until_ready(r)
    dt = (time.time() - t0) / REPS
    print(f"{name:46s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 18)
    print(f"devices: {jax.devices()}  lanes: {n}")

    from mitsuba_path_guiding_tpu.core import rng
    from mitsuba_path_guiding_tpu.core.math import Frame, normalize
    from mitsuba_path_guiding_tpu.guiding.grid import (
        _gather_cells,
        _mixture_pdf,
        _mixture_sample,
        cell_index,
        make_grid,
    )
    from mitsuba_path_guiding_tpu.guiding.sampler import make_guide_fn
    from mitsuba_path_guiding_tpu.models import bsdf as bsdf_mod
    from mitsuba_path_guiding_tpu.models import emitter as em_mod
    from mitsuba_path_guiding_tpu.models.bsdf import types_present
    from mitsuba_path_guiding_tpu.models.emitter import kinds_present
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import cornell_box
    from mitsuba_path_guiding_tpu.ops.gather_pallas import gather_rows_t

    scene = build_scene(cornell_box())
    mat_types = types_present(scene.mats)
    em_kinds = kinds_present(scene.emitters)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = jax.random.uniform(k1, (n, 3)) * (scene.aabb_max - scene.aabb_min) + scene.aabb_min
    d = normalize(jax.random.normal(k2, (n, 3)))
    wi = normalize(jax.random.normal(k3, (n, 3)) * jnp.array([1.0, 1.0, 0.0]) + jnp.array([0.0, 0.0, 1.0]))
    u3 = jax.random.uniform(k4, (n, 3))
    u1 = u3[..., 0]
    mid = (jax.random.uniform(k1, (n,)) * scene.mats.type.shape[0]).astype(jnp.int32)
    grid = make_grid(scene.aabb_min, scene.aabb_max, res=16, n_lobes=8)
    frame = Frame.from_normal(d)

    cid = cell_index(grid, p, levels=0)
    params = _gather_cells(grid, cid)

    timeit("cell_index levels=0", lambda: cell_index(grid, p, levels=0))
    timeit("cell_index levels=3", lambda: cell_index(grid, p, levels=3))
    timeit("_gather_cells (4096x41 XLA gather)", lambda: _gather_cells(grid, cid))
    timeit("_mixture_pdf", lambda: _mixture_pdf(params, d))
    timeit("_mixture_sample", lambda: _mixture_sample(params, u1, u3[..., 0:2]))
    timeit("gather_rows_t mats (pallas onehot)", lambda: gather_rows_t(scene.mats.packed, mid))
    timeit("bsdf.sample", lambda: bsdf_mod.sample(scene.mats, mid, wi, u3, types=mat_types))
    timeit("bsdf.eval_pdf", lambda: bsdf_mod.eval_pdf(scene.mats, mid, wi, wi, types=mat_types))
    timeit("em.sample_direct", lambda: em_mod.sample_direct_jit(scene.emitters, scene.geo, p, u3, kinds=em_kinds))
    timeit("em.eval+pdf env", lambda: (em_mod.eval_env(scene.emitters, d, kinds=em_kinds), em_mod.pdf_env(scene.emitters, d, kinds=em_kinds)))

    guide = make_guide_fn(0.5, mat_types, levels=0)
    timeit(
        "guide callback (full guided sampling)",
        lambda: guide(grid, scene.mats, mid, p, frame, wi, u3, u1, u1),
    )
    guide0 = make_guide_fn(0.0, mat_types, levels=0)
    timeit(
        "guide callback alpha=0 (unguided shape)",
        lambda: guide0(grid, scene.mats, mid, p, frame, wi, u3, u1, u1),
    )

    # intersection + RNG for scale
    from mitsuba_path_guiding_tpu.accel.traverse import intersect_brute
    o = p
    timeit("intersect brute 36 tris", lambda: intersect_brute(scene.geo, o, d))
    rkeys = rng.ray_keys(rng.base_key(0), jnp.arange(n, dtype=jnp.int32) % 65536, jnp.zeros((n,), jnp.int32))
    timeit("bounce_uniform 9", lambda: rng.bounce_uniform(rkeys, 3, 9))


if __name__ == "__main__":
    main()
