"""Capture a device profile of the bench wave and print the top HLO ops.

Usage: python tools/profile_wave.py [n_lanes_log2] [--unguided] [--nee=0]
Parses the xplane via tensorboard_plugin_profile's converter (no UI).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 19)
    from mitsuba_path_guiding_tpu.core import rng
    from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA
    from mitsuba_path_guiding_tpu.film.film import splat
    from mitsuba_path_guiding_tpu.guiding.grid import make_grid
    from mitsuba_path_guiding_tpu.guiding.sampler import make_guide_fn
    from mitsuba_path_guiding_tpu.integrators.path import trace
    from mitsuba_path_guiding_tpu.models.bsdf import types_present
    from mitsuba_path_guiding_tpu.models.emitter import kinds_present
    from mitsuba_path_guiding_tpu.models.sensor import generate_rays
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import cornell_box

    scene = build_scene(cornell_box())
    W = H = 256
    em_kinds = kinds_present(scene.emitters)
    mat_types = types_present(scene.mats)
    guided = "--unguided" not in sys.argv
    use_nee = "--nee=0" not in sys.argv
    grid = make_grid(scene.aabb_min, scene.aabb_max, res=16, n_lobes=8)
    from mitsuba_path_guiding_tpu.guiding.grid import active_levels

    guide = make_guide_fn(0.5, mat_types, levels=active_levels(grid)) if guided else None
    key = rng.base_key(0)
    pix = jnp.arange(n, dtype=jnp.int32) % (W * H)
    sidx = jnp.zeros_like(pix)

    @jax.jit
    def wave(rgbw, grid, sidx):
        rkeys = rng.ray_keys(key, pix, sidx)
        u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2)
        o, d, film_xy = generate_rays(scene.sensor, W, H, pix, u_cam)
        L, aux, _ = trace(
            scene, o, d, rkeys, max_depth=5, use_bvh=False, use_nee=use_nee,
            guide=guide, guide_state=grid, record_paths=False,
            em_kinds=em_kinds, mat_types=mat_types,
        )
        from mitsuba_path_guiding_tpu.film.film import splat_box_aligned

        return splat_box_aligned(rgbw, L, W * H)

    rgbw = jnp.zeros((W * H, 4), jnp.float32)
    out = wave(rgbw, grid, sidx)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = wave(out, grid, sidx)
    jax.block_until_ready(out)
    print(f"wave: {(time.time() - t0) / 5 * 1e3:.1f} ms", flush=True)

    logdir = "/tmp/jaxprof"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = wave(out, grid, sidx)
        jax.block_until_ready(out)

    # find the xplane file and convert
    import glob

    xs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane:", xs)
    if not xs:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for tool in ("op_profile", "framework_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data(xs, tool, {})
            fn = f"/tmp/prof_{tool}.out"
            with open(fn, "wb") as f:
                f.write(data if isinstance(data, bytes) else data.encode())
            print("wrote", fn, flush=True)
        except Exception as e:
            print(tool, "failed:", repr(e))


if __name__ == "__main__":
    main()
