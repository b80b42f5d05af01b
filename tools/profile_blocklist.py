"""TPU microbenchmark for the block-list intersector (VERDICT item 1).

Builds a structured interior-class scene (room walls + a grid of
tessellated spheres), then times primary (coherent) and bounce
(hemisphere-scattered) waves through intersect_blocklist_sorted, with the
old two-level superblock kernel as the comparison point.

Usage: python tools/profile_blocklist.py [n_tris] [n_rays]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def make_sphere(center, radius, nu, nv):
    """Tessellated UV sphere -> (p0, e1, e2) triangle arrays."""
    u = np.linspace(0, 2 * np.pi, nu + 1)
    v = np.linspace(0, np.pi, nv + 1)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    x = center[0] + radius * np.cos(uu) * np.sin(vv)
    y = center[1] + radius * np.sin(uu) * np.sin(vv)
    z = center[2] + radius * np.cos(vv)
    P = np.stack([x, y, z], axis=-1)  # (nu+1, nv+1, 3)
    a = P[:-1, :-1].reshape(-1, 3)
    b = P[1:, :-1].reshape(-1, 3)
    c = P[:-1, 1:].reshape(-1, 3)
    d = P[1:, 1:].reshape(-1, 3)
    p0 = np.concatenate([a, b])
    p1 = np.concatenate([b, d])
    p2 = np.concatenate([c, c])
    return p0, p1 - p0, p2 - p0


def make_quad(p, ea, eb):
    p = np.asarray(p, np.float32)
    ea = np.asarray(ea, np.float32)
    eb = np.asarray(eb, np.float32)
    return (
        np.stack([p, p + ea + eb]),
        np.stack([ea, -ea]),
        np.stack([eb, -eb]),
    )


def make_interior(target_tris: int, seed=0):
    """Room (12 tris) + grid of spheres sized to hit target_tris."""
    rs = np.random.default_rng(seed)
    parts = []
    # room: 10x10x10 box at origin (inward normals irrelevant here)
    for p, ea, eb in [
        ((-5, -5, -5), (10, 0, 0), (0, 10, 0)),
        ((-5, -5, 5), (10, 0, 0), (0, 10, 0)),
        ((-5, -5, -5), (10, 0, 0), (0, 0, 10)),
        ((-5, 5, -5), (10, 0, 0), (0, 0, 10)),
        ((-5, -5, -5), (0, 10, 0), (0, 0, 10)),
        ((5, -5, -5), (0, 10, 0), (0, 0, 10)),
    ]:
        parts.append(make_quad(p, ea, eb))
    n_spheres = 64
    per = max(target_tris // n_spheres, 32)
    nu = max(int(np.sqrt(per / 2)), 4)
    g = 4  # 4x4x4 grid
    for i in range(n_spheres):
        cx = (i % g - (g - 1) / 2) * 2.2
        cy = ((i // g) % g - (g - 1) / 2) * 2.2
        cz = (i // (g * g) - (g - 1) / 2) * 2.2
        c = np.array([cx, cy, cz]) + rs.normal(0, 0.2, 3)
        parts.append(make_sphere(c, 0.8, nu, nu))
    p0 = np.concatenate([p[0] for p in parts]).astype(np.float32)
    e1 = np.concatenate([p[1] for p in parts]).astype(np.float32)
    e2 = np.concatenate([p[2] for p in parts]).astype(np.float32)
    return p0, e1, e2


def camera_rays(n, seed=0):
    """Perspective rays from a room corner."""
    rs = np.random.default_rng(seed)
    side = int(np.sqrt(n))
    px = (np.arange(n) % side + rs.random(n)) / side - 0.5
    py = (np.arange(n) // side % side + rs.random(n)) / side - 0.5
    o = np.tile(np.array([-4.5, -4.5, 2.0], np.float32), (n, 1))
    fwd = np.array([1.0, 1.0, -0.4])
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 0, 1.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    d = fwd[None] + 1.2 * (px[:, None] * right[None] + py[:, None] * up[None])
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def bounce_rays(p0, e1, e2, o, d, hit_t, hit_prim, seed=1):
    """Cosine-hemisphere rays from the primary hit points."""
    rs = np.random.default_rng(seed)
    n = o.shape[0]
    hp = o + hit_t[:, None] * d
    ng = np.cross(e1[hit_prim], e2[hit_prim])
    ng /= np.maximum(np.linalg.norm(ng, axis=-1, keepdims=True), 1e-12)
    ng *= -np.sign(np.sum(ng * d, axis=-1, keepdims=True))
    u1, u2 = rs.random(n), rs.random(n)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    t = np.where(np.abs(ng[:, 0:1]) < 0.9, np.array([[1.0, 0, 0]]), np.array([[0, 1.0, 0]]))
    x = np.cross(ng, t)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    y = np.cross(ng, x)
    local = np.stack([r * np.cos(phi), r * np.sin(phi), np.sqrt(1 - u1)], -1)
    dd = local[:, 0:1] * x + local[:, 1:2] * y + local[:, 2:3] * ng
    return (hp + 1e-3 * ng).astype(np.float32), dd.astype(np.float32)


def bench(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 524_288

    p0, e1, e2 = make_interior(target)
    print(f"scene: {p0.shape[0]} tris; rays/wave: {n_rays}; devices: {jax.devices()}")

    from mitsuba_path_guiding_tpu.accel.blocks import build_blocklist
    from mitsuba_path_guiding_tpu.accel.bvh import build_bvh
    from mitsuba_path_guiding_tpu.ops.intersect_blocklist import (
        intersect_blocklist_sorted,
    )

    t0 = time.perf_counter()
    bvh = build_bvh(p0, e1, e2)
    t1 = time.perf_counter()
    bl = build_blocklist(p0, e1, e2, bvh)
    t2 = time.perf_counter()
    print(f"bvh build {t1-t0:.2f}s; blocklist cut+pack {t2-t1:.2f}s; "
          f"blocks={bl.n_blocks} superblocks={bl.tri_pack.shape[0]}")

    o, d = camera_rays(n_rays)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((n_rays,), 3.0e38)

    f = jax.jit(lambda o, d, t: intersect_blocklist_sorted(bl, o, d, t))
    dt, out = bench(f, o, d, tmax)
    hitrate = float(jnp.mean(out[4]))
    print(f"primary wave: {dt*1e3:.2f} ms -> {n_rays/dt/1e6:.1f} Mrays/s "
          f"(hit rate {hitrate:.2f})")

    # bounce wave from the primary hits
    t_np = np.asarray(out[0])
    prim_np = np.maximum(np.asarray(out[1]), 0)
    valid = np.asarray(out[4])
    t_np = np.where(valid, t_np, 1.0)
    ob, db = bounce_rays(p0, e1, e2, np.asarray(o), np.asarray(d), t_np, prim_np)
    ob, db = jnp.asarray(ob), jnp.asarray(db)
    dt, out2 = bench(f, ob, db, tmax)
    print(f"bounce wave:  {dt*1e3:.2f} ms -> {n_rays/dt/1e6:.1f} Mrays/s "
          f"(hit rate {float(jnp.mean(out2[4])):.2f})")

    # old two-level kernel comparison
    if "--old" in sys.argv:
        from mitsuba_path_guiding_tpu.ops.intersect_twolevel import (
            build_blocks, intersect_blocks_sorted,
        )
        bt = build_blocks(p0, e1, e2)
        g = jax.jit(lambda o, d, t: intersect_blocks_sorted(bt, o, d, t))
        dt, _ = bench(g, o, d, tmax, reps=2)
        print(f"OLD twolevel primary: {dt*1e3:.2f} ms -> {n_rays/dt/1e6:.1f} Mrays/s")


if __name__ == "__main__":
    main()
