"""End-to-end timing of the pair intersector vs the blocklist kernel on
the interior scene (coherent + bounce waves).

Usage: python tools/profile_pairs.py [n_tris] [n_rays]
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
from mitsuba_path_guiding_tpu.accel.pairs import build_pair_table
from mitsuba_path_guiding_tpu.ops.intersect_pairs import intersect_pairs_raw
from tools.profile_blocklist import make_interior, camera_rays, bounce_rays, bench

INF = 3.0e38


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 524_288
    p0, e1, e2 = make_interior(target)
    bvh = build_bvh(p0, e1, e2)
    bl = build_blocklist(p0, e1, e2, bvh)
    pt = build_pair_table(p0, e1, e2, bvh, leaf=128, sb_blk=32)
    print(f"tris={p0.shape[0]} blocks={pt.blk_lo.shape[0]} sbs={pt.sb_lo.shape[0]}")

    o, d = camera_rays(n_rays)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((n_rays,), INF)

    fk = jax.jit(lambda o, d, t: m.intersect_blocklist_sorted(bl, o, d, t))
    fp = jax.jit(lambda o, d, t: intersect_pairs_raw(pt, o, d, t))
    fo = jax.jit(lambda o, d, t: intersect_pairs_raw(pt, o, d, t, any_hit=True))

    for name, (ow, dw) in [("coherent", (o, d))]:
        dt, res_k = bench(fk, ow, dw, tmax)
        print(f"{name} blocklist: {dt*1e3:7.2f} ms -> {n_rays/dt/1e6:6.1f} Mrays/s")
        dt, res_p = bench(fp, ow, dw, tmax)
        t, prim, u, v, valid, proven = res_p
        pv = np.asarray(proven)
        print(f"{name} pairs:     {dt*1e3:7.2f} ms -> {n_rays/dt/1e6:6.1f} Mrays/s "
              f"(proven {pv.mean()*100:.2f}%)")
        agree = (np.asarray(prim) == np.asarray(res_k[1])) | ~pv
        print(f"{name} agree with blocklist among proven: "
              f"{(agree.mean())*100:.4f}%")

    # bounce wave
    t_np = np.where(np.asarray(res_k[4]), np.asarray(res_k[0]), 1.0)
    prim_np = np.maximum(np.asarray(res_k[1]), 0)
    ob, db = bounce_rays(p0, e1, e2, np.asarray(o), np.asarray(d), t_np, prim_np)
    ob, db = jnp.asarray(ob), jnp.asarray(db)
    dt, res_k = bench(fk, ob, db, tmax)
    print(f"bounce   blocklist: {dt*1e3:7.2f} ms -> {n_rays/dt/1e6:6.1f} Mrays/s")
    dt, res_p = bench(fp, ob, db, tmax)
    pv = np.asarray(res_p[5])
    print(f"bounce   pairs:     {dt*1e3:7.2f} ms -> {n_rays/dt/1e6:6.1f} Mrays/s "
          f"(proven {pv.mean()*100:.2f}%)")
    agree = (np.asarray(res_p[1]) == np.asarray(res_k[1])) | ~pv
    print(f"bounce agree among proven: {agree.mean()*100:.4f}%")

    # shadow (any-hit) wave: bounce origins toward a fixed light point
    light = np.array([0.0, 0.0, 4.5], np.float32)
    sd = light[None, :] - np.asarray(ob)
    dist = np.linalg.norm(sd, axis=1)
    sd = sd / dist[:, None]
    so, sdv = jnp.asarray(np.asarray(ob)), jnp.asarray(sd)
    stm = jnp.asarray(dist - 1e-3)
    fo_k = jax.jit(lambda o, d, t: m.occluded_blocklist_sorted(bl, o, d, t))
    dt, occ_k = bench(fo_k, so, sdv, stm)
    print(f"shadow   blocklist: {dt*1e3:7.2f} ms -> {n_rays/dt/1e6:6.1f} Mrays/s")
    dt, occ_p = bench(fo, so, sdv, stm)
    pv = np.asarray(occ_p[1])
    agree = (np.asarray(occ_p[0]) == np.asarray(occ_k)) | ~pv
    print(f"shadow   pairs:     {dt*1e3:7.2f} ms -> {n_rays/dt/1e6:6.1f} Mrays/s "
          f"(proven {pv.mean()*100:.2f}%, agree {agree.mean()*100:.4f}%)")


if __name__ == "__main__":
    main()
