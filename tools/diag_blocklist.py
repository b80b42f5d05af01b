"""Diagnostics for the block-list intersector: where does the time go?

Reports stage-A candidate stats, kernel early-exit depth (j_end), MT tile
visits, and times stage A / full kernel / a gates-only kernel variant.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import mitsuba_path_guiding_tpu.ops.intersect_blocklist as m
from mitsuba_path_guiding_tpu.accel.blocks import build_blocklist
from mitsuba_path_guiding_tpu.accel.bvh import build_bvh
from tools.profile_blocklist import make_interior, camera_rays, bounce_rays, bench

m.DEBUG_COUNTERS = True


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 524_288
    p0, e1, e2 = make_interior(target)
    bvh = build_bvh(p0, e1, e2)
    bl = build_blocklist(p0, e1, e2, bvh)
    print(f"tris={p0.shape[0]} blocks={bl.n_blocks} sbs={bl.tri_pack.shape[0]}")

    o, d = camera_rays(n_rays)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((n_rays,), 3.0e38)

    # stage A alone
    o_p, d_p, t_p, npad = m._pad_rays(o, d, tmax)
    fa = jax.jit(lambda o, d, t: m.candidate_superblocks(bl.sb_lo, bl.sb_hi, o, d, t))
    dt, (cand, cnt) = bench(fa, o_p, d_p, t_p)
    cnt = np.asarray(cnt)
    print(f"stageA: {dt*1e3:.2f} ms; cand/tile mean {cnt.mean():.1f} "
          f"max {cnt.max()} overflow tiles {(cnt > cand.shape[1]).sum()}")

    # full kernel with counters
    f = jax.jit(lambda o, d, t: m.intersect_blocklist_raw(bl, o, d, t))
    # intersect_blocklist_raw returns 5-tuple slicing rows 0..3; call the
    # pallas path manually for rows 4/5: easiest is to re-run raw and read
    # debug rows by calling the inner once
    dt, out = bench(f, o, d, tmax)
    print(f"kernel (sorted=no): {dt*1e3:.2f} ms -> {n_rays/dt/1e6:.1f} Mrays/s")

    # grab debug rows via a direct call
    import functools
    raw = m.intersect_blocklist_raw.__wrapped__  # unjitted
    res = jax.jit(lambda: raw(bl, o_p, d_p, t_p))
    # easier: recompute inside the module with its own jit and fetch rows
    # via a small copy of the body — instead read them from a one-off call:
    t, prim, u, v, valid = f(o, d, tmax)
    print("hit rate", float(jnp.mean(valid)))

    # the debug rows live in the padded out; expose with a tiny wrapper
    def dbg(o, d, tm):
        o_p2, d_p2, t_p2, _ = m._pad_rays(o, d, tm)
        c2, n2 = m.candidate_superblocks(bl.sb_lo, bl.sb_hi, o_p2, d_p2, t_p2)
        import jax.experimental.pallas as pl  # noqa
        return c2, n2

    # j_end / mt visits: patch via module-level flag already on; rows are
    # dropped by intersect_blocklist_raw, so reproduce its pallas_call here
    out6 = m._debug_call(bl, o_p, d_p, t_p)
    j_end = np.asarray(out6[4, ::m.RAY_TILE])
    mt = np.asarray(out6[5, ::m.RAY_TILE])
    print(f"j_end mean {j_end.mean():.1f} max {j_end.max():.0f}; "
          f"MT visits/tile mean {mt.mean():.1f} max {mt.max():.0f}")

    # bounce wave
    t_np = np.where(np.asarray(valid), np.asarray(t), 1.0)
    prim_np = np.maximum(np.asarray(prim), 0)
    ob, db = bounce_rays(p0, e1, e2, np.asarray(o), np.asarray(d), t_np, prim_np)
    ob, db = jnp.asarray(ob), jnp.asarray(db)
    perm = jnp.argsort(m._ray_sort_keys(bl, ob, db))
    obs, dbs = ob[perm], db[perm]
    dt, _ = bench(f, obs, dbs, tmax)
    print(f"bounce sorted kernel: {dt*1e3:.2f} ms -> {n_rays/dt/1e6:.1f} Mrays/s")
    out6 = m._debug_call(bl, *m._pad_rays(obs, dbs, tmax)[:3])
    j_end = np.asarray(out6[4, ::m.RAY_TILE])
    mt = np.asarray(out6[5, ::m.RAY_TILE])
    print(f"bounce j_end mean {j_end.mean():.1f} max {j_end.max():.0f}; "
          f"MT visits/tile mean {mt.mean():.1f} max {mt.max():.0f}")


if __name__ == "__main__":
    main()
