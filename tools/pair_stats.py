"""Design-space measurement for the pair-expansion intersector.

For real coherent + bounce waves (Morton-sorted), measures per-GROUP
(8/16 Morton-adjacent rays) candidate-block counts at leaf sizes
{32, 64, 128}, both with tmax = INF (no early exit: the L cap a
single-phase dense pass needs) and tmax = oracle hit distance (perfect
early exit: the lower bound a phased pass can approach).

Usage: python tools/pair_stats.py [n_tris] [n_rays]
"""
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import mitsuba_path_guiding_tpu.ops.intersect_blocklist as m
from mitsuba_path_guiding_tpu.accel.blocks import build_blocklist
from mitsuba_path_guiding_tpu.accel.bvh import build_bvh
from mitsuba_path_guiding_tpu.accel.pairs import build_pair_table
from tools.profile_blocklist import make_interior, camera_rays, bounce_rays

INF = 3.0e38


def group_bounds(o, d, tmax, g):
    n = o.shape[0]
    G = n // g
    og = o[: G * g].reshape(G, g, 3)
    dg = d[: G * g].reshape(G, g, 3)
    tg = tmax[: G * g].reshape(G, g)
    return (og.min(1), og.max(1), dg.min(1), dg.max(1), tg.max(1))


@jax.jit
def _counts_chunk(blk_lo, blk_hi, olo, ohi, dlo, dhi, tmx):
    """(Gc,) conservative interval-arithmetic slab counts vs all blocks."""
    eps = 1e-12
    Gc = olo.shape[0]
    B = blk_lo.shape[0]
    tn = jnp.zeros((Gc, B))
    tf = jnp.full((Gc, B), INF)
    for a in range(3):
        con = (dlo[:, a] > eps) | (dhi[:, a] < -eps)
        il = (1.0 / jnp.where(con, dhi[:, a], 1.0))[:, None]
        ih = (1.0 / jnp.where(con, dlo[:, a], 1.0))[:, None]
        lo_m_lo = blk_lo[:, a][None, :] - ohi[:, a][:, None]
        lo_m_hi = blk_lo[:, a][None, :] - olo[:, a][:, None]
        hi_m_lo = blk_hi[:, a][None, :] - ohi[:, a][:, None]
        hi_m_hi = blk_hi[:, a][None, :] - olo[:, a][:, None]

        def ib(x0, x1):
            c = jnp.stack([x0 * il, x0 * ih, x1 * il, x1 * ih])
            return c.min(0), c.max(0)

        t0l, t0h = ib(lo_m_lo, lo_m_hi)
        t1l, t1h = ib(hi_m_lo, hi_m_hi)
        tna = jnp.where(con[:, None], jnp.minimum(t0l, t1l), 0.0)
        tfa = jnp.where(con[:, None], jnp.maximum(t0h, t1h), INF)
        tn = jnp.maximum(tn, tna)
        tf = jnp.minimum(tf, tfa)
    tn = jnp.maximum(tn, 0.0)
    hit = (tf >= tn) & (tn <= tmx[:, None])
    return jnp.sum(hit, axis=1).astype(jnp.int32)


def counts(pt, o, d, tmax, g, chunk=8192):
    olo, ohi, dlo, dhi, tmx = group_bounds(o, d, tmax, g)
    G = olo.shape[0]
    out = []
    for s in range(0, G, chunk):
        e = min(s + chunk, G)
        out.append(np.asarray(_counts_chunk(
            pt.blk_lo, pt.blk_hi, olo[s:e], ohi[s:e], dlo[s:e], dhi[s:e], tmx[s:e]
        )))
    return np.concatenate(out)


def report(tag, c, leaf):
    q = np.percentile(c, [50, 90, 99, 99.9])
    print(f"  {tag}: mean {c.mean():6.1f}  p50 {q[0]:5.0f} p90 {q[1]:5.0f} "
          f"p99 {q[2]:5.0f} p99.9 {q[3]:6.0f} max {c.max():6d} "
          f"tests/ray {c.mean() * leaf / 1.0:7.0f}")


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 262_144
    p0, e1, e2 = make_interior(target)
    bvh = build_bvh(p0, e1, e2)
    bl = build_blocklist(p0, e1, e2, bvh)

    o, d = camera_rays(n_rays)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((n_rays,), INF)
    # oracle t from the existing (verified) kernel
    t, prim, _, _, valid = jax.jit(
        lambda o, d, t: m.intersect_blocklist_raw(bl, o, d, t)
    )(o, d, tmax)
    t_np = np.where(np.asarray(valid), np.asarray(t), 1.0)
    prim_np = np.maximum(np.asarray(prim), 0)
    ob, db = bounce_rays(p0, e1, e2, np.asarray(o), np.asarray(d), t_np, prim_np)
    ob, db = jnp.asarray(ob), jnp.asarray(db)
    tb, primb, _, _, validb = jax.jit(
        lambda o, d, t: m.intersect_blocklist_raw(bl, o, d, t)
    )(ob, db, tmax)

    waves = {
        "coherent": (o, d, t, valid),
        "bounce": (ob, db, tb, validb),
    }

    for leaf in (32, 128):
        pt = build_pair_table(p0, e1, e2, bvh, leaf=leaf)
        B = pt.blk_lo.shape[0]
        print(f"leaf={leaf}: {B} blocks ({p0.shape[0]} tris)")
        for wname, (ow, dw, tw, vw) in waves.items():
            # Morton sort within the wave (as the real pipeline does)
            perm = np.asarray(jnp.argsort(m._ray_sort_keys(bl, ow, dw)))
            ows = np.asarray(ow)[perm]
            dws = np.asarray(dw)[perm]
            tws = np.where(np.asarray(vw), np.asarray(tw), INF)[perm]
            for g in (1, 8):
                sub = slice(0, 16384) if g == 1 else slice(None)
                c_inf = counts(pt, ows[sub], dws[sub], np.full_like(tws[sub], INF), g)
                c_orc = counts(pt, ows[sub], dws[sub], tws[sub] * 1.0001, g)
                report(f"{wname:9s} g={g:2d} tmax=INF   ", c_inf, leaf)
                report(f"{wname:9s} g={g:2d} tmax=oracle", c_orc, leaf)
        print()


if __name__ == "__main__":
    main()
