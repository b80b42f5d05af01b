"""Full-render throughput on the Veach-door-class big scene (BASELINE
config 3 family): path tracing with NEE+MIS through the block-list accel,
waves batched into one dispatch (the tunnel's fixed per-dispatch overhead
otherwise dominates; see bench.py).

Usage: python tools/profile_render_big.py [target_tris] [spp_waves]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    n_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from functools import partial

    from mitsuba_path_guiding_tpu.core import rng
    from mitsuba_path_guiding_tpu.core.rng import TAG_CAMERA
    from mitsuba_path_guiding_tpu.film.film import splat_box_aligned
    from mitsuba_path_guiding_tpu.integrators.path import trace
    from mitsuba_path_guiding_tpu.models.bsdf import types_present
    from mitsuba_path_guiding_tpu.models.emitter import kinds_present
    from mitsuba_path_guiding_tpu.models.sensor import generate_rays
    from mitsuba_path_guiding_tpu.scene.builder import build_scene
    from mitsuba_path_guiding_tpu.scene.scenes import door_room

    t0 = time.time()
    scene = build_scene(door_room(target))
    print(f"scene: {scene.geo.p0.shape[0]} tris, "
          f"{scene.blocks.n_blocks if scene.blocks else 0} blocks, "
          f"build {time.time()-t0:.1f}s", file=sys.stderr)

    W = H = 512
    MAX_DEPTH = 5
    SPP_PER_WAVE = 2  # 512*512*2 = 524288 lanes
    n_pix = W * H
    em_kinds = kinds_present(scene.emitters)
    mat_types = types_present(scene.mats)
    pix = jnp.tile(jnp.arange(n_pix, dtype=jnp.int32), SPP_PER_WAVE)
    key = rng.base_key(0)

    def _one_wave(rgbw, wave_idx):
        sidx = (
            jnp.repeat(jnp.arange(SPP_PER_WAVE, dtype=jnp.int32), n_pix)
            + wave_idx * SPP_PER_WAVE
        )
        rkeys = rng.ray_keys(key, pix, sidx)
        u_cam = rng.event_uniform(rkeys, TAG_CAMERA, 2)
        o, d, film_xy = generate_rays(scene.sensor, W, H, pix, u_cam)
        L, aux, _ = trace(
            scene, o, d, rkeys, max_depth=MAX_DEPTH,
            em_kinds=em_kinds, mat_types=mat_types,
        )
        rgbw = splat_box_aligned(rgbw, L, n_pix)
        return rgbw, jnp.sum(aux.n_bounces)

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
    def waves(rgbw, wave0, n):
        def body(carry, i):
            rgbw, segs = carry
            rgbw, s = _one_wave(rgbw, wave0 + i)
            return (rgbw, segs + s), None
        (rgbw, segs), _ = jax.lax.scan(
            body, (rgbw, jnp.int32(0)), jnp.arange(n, dtype=jnp.int32))
        return rgbw, segs

    rgbw = jnp.zeros((n_pix, 4), jnp.float32)
    t0 = time.time()
    rgbw, segs = waves(rgbw, jnp.int32(0), n_waves)
    jax.block_until_ready(rgbw)
    print(f"compile+first window: {time.time()-t0:.1f}s", file=sys.stderr)

    best = None
    for w in range(3):
        t0 = time.time()
        rgbw, segs = waves(rgbw, jnp.int32((w + 1) * n_waves), n_waves)
        jax.block_until_ready(rgbw)
        dt = time.time() - t0
        n_seg = int(segs)
        rays = n_seg * 2  # + NEE shadow ray per segment
        print(f"window {w}: {dt:.2f}s, {n_seg} segs -> "
              f"{rays/dt/1e6:.1f} Mrays/s", file=sys.stderr)
        if best is None or dt < best[0]:
            best = (dt, rays)

    print(f"BEST: {best[1]/best[0]/1e6:.2f} Mrays/s")
    img = np.asarray(rgbw[:, :3] / np.maximum(np.asarray(rgbw[:, 3:4]), 1e-8))
    img = img.reshape(H, W, 3)
    assert np.isfinite(img).all()
    ldr = (np.clip(img / (1 + img), 0, 1) ** (1 / 2.2) * 255).astype(np.uint8)
    import struct
    import zlib
    raw = b"".join(b"\x00" + ldr[y].tobytes() for y in range(H))
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    open("/tmp/door.png", "wb").write(png)
    print("wrote /tmp/door.png", file=sys.stderr)


if __name__ == "__main__":
    main()
