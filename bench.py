"""Benchmark: guided path-tracing throughput on the current accelerator.

Measures steady-state Mrays/s on the flagship config (guided Cornell box,
BASELINE.md config 2 family): trains the vMF guiding cache for a few
progressions, then times large guided render waves.  Ray count includes
path segments (primary + bounces that hit or escaped) and NEE shadow rays —
the same accounting a CPU ray tracer's Mrays/s uses.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N/50}
(vs_baseline is against the 50 Mrays/s/chip target in BASELINE.json.)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import numpy as np

    from mitsuba_path_guiding_tpu.guiding.grid import make_grid
    from mitsuba_path_guiding_tpu.guiding.sampler import make_guide_fn
    from mitsuba_path_guiding_tpu.integrators.render import RenderConfig
    from mitsuba_path_guiding_tpu.parallel.mesh import (
        make_device_mesh,
        make_sharded_step,
    )
    from mitsuba_path_guiding_tpu.guiding.fit import update_grid
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import cornell_box

    dev = jax.devices()
    log(f"devices: {dev}")
    n_dev = len(dev)

    scene = build_scene(cornell_box())
    W = H = 256
    MAX_DEPTH = 5
    SPP_PER_WAVE = 4  # lanes = W*H*SPP_PER_WAVE per dispatch
    cfg = RenderConfig(width=W, height=H, spp=1, max_depth=MAX_DEPTH, seed=0)

    mesh = make_device_mesh(dev)
    guide = make_guide_fn(0.5)
    grid = make_grid(scene.aabb_min, scene.aabb_max, res=16, n_lobes=8)
    step = make_sharded_step(scene, cfg, mesh, guide=guide, train=True)

    n_pix = W * H
    base_pix = jnp.arange(n_pix, dtype=jnp.int32)
    pix = jnp.tile(base_pix, SPP_PER_WAVE)
    rgbw = jnp.zeros((n_pix, 4), jnp.float32)

    def wave(rgbw, grid, wave_idx, fit=True):
        sidx = jnp.repeat(
            jnp.arange(
                wave_idx * SPP_PER_WAVE, (wave_idx + 1) * SPP_PER_WAVE, dtype=jnp.int32
            ),
            n_pix,
        )
        # NOTE: the record-free render step (train=False) currently hits an
        # XLA compile cliff through shard_map (~20x slower wave); the
        # training step measures faster even with stats attached, so use it
        # for both phases and drop the stats when frozen.
        rgbw, stats, n_seg = step(pix, sidx, rgbw, grid)
        if fit and stats is not None:
            grid = update_grid(grid, *stats)
        return rgbw, grid, n_seg

    # --- warmup + guiding training (compile happens here)
    t0 = time.time()
    rgbw, grid, n_seg0 = wave(rgbw, grid, 0)
    jax.block_until_ready(rgbw)
    log(f"compile+first wave: {time.time() - t0:.1f}s")
    t0 = time.time()
    for i in range(1, 4):
        rgbw, grid, _ = wave(rgbw, grid, i)
    jax.block_until_ready(rgbw)
    log(f"training waves: {time.time() - t0:.1f}s; valid cells: "
        f"{int(np.asarray(grid.valid).sum())}")

    # --- timed measurement: guided rendering, cache frozen
    N_WAVES = 8
    t0 = time.time()
    seg_total = 0
    for i in range(4, 4 + N_WAVES):
        rgbw, _, n_seg = wave(rgbw, grid, i, fit=False)
        seg_total += int(n_seg)
    jax.block_until_ready(rgbw)
    dt = time.time() - t0

    lanes = n_pix * SPP_PER_WAVE * N_WAVES
    # rays = path segments (hits) + escaped primaries/bounces ~ lanes worth
    # of first segments + NEE shadow rays (one per hit segment, NEE on)
    shadow = seg_total
    escaped_est = 0  # conservatively ignore escaped-segment traversal cost
    rays = seg_total + shadow + escaped_est
    mrays = rays / dt / 1e6
    log(
        f"{N_WAVES} waves of {n_pix * SPP_PER_WAVE} lanes in {dt:.2f}s; "
        f"{seg_total} segments (+{shadow} shadow rays) -> {mrays:.2f} Mrays/s"
    )
    img = np.asarray(rgbw[:, 0:3] / np.maximum(np.asarray(rgbw[:, 3:4]), 1e-8))
    assert np.isfinite(img).all(), "non-finite image"

    result = {
        "metric": f"guided path tracing Mrays/s ({n_dev} chip{'s' if n_dev > 1 else ''}, Cornell 256x256 depth-{MAX_DEPTH}, NEE+MIS, vMF guiding)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 50.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
