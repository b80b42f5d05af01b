"""Pallas TPU kernel: tiled dense ray-triangle intersection.

The hot op of SURVEY.md §2.8 item 1 as a hand-written TPU kernel: the
(T, N) Moeller-Trumbore formulation of accel/traverse.py materializes
O(T*N) HBM traffic; this kernel tiles (TRI_TILE, RAY_TILE) blocks through
VMEM with a running best-hit accumulator, so HBM traffic is O(T + N) —
the scaling needed for mid-size scenes (10^4..10^5 triangles) where
per-ray divergent BVH traversal is TPU-hostile and full materialization
does not fit.

Grid: (ray_tiles, tri_tiles); the triangle axis iterates innermost and
accumulates into the same output block (matmul-accumulator pattern).
Outputs (4, N): rows [t, prim(as f32), u, v].
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 512
TRI_TILE = 128
INF = 3.0e38
EPS_T = 1e-4


def _kernel(tri_ref, ray_ref, tmax_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[0, :] = jnp.minimum(tmax_ref[0, :], INF)
        out_ref[1, :] = jnp.full((RAY_TILE,), -1.0)
        out_ref[2, :] = jnp.zeros((RAY_TILE,))
        out_ref[3, :] = jnp.zeros((RAY_TILE,))

    tri = tri_ref[...]  # (12, TRI_TILE): p0 e1 e2 rows + tri index row
    ray = ray_ref[...]  # (8, RAY_TILE): ox oy oz dx dy dz

    tcol = lambda r: tri[r, :][:, None]       # (TRI_TILE, 1)
    rrow = lambda r: ray[r, :][None, :]       # (1, RAY_TILE)

    p0x, p0y, p0z = tcol(0), tcol(1), tcol(2)
    e1x, e1y, e1z = tcol(3), tcol(4), tcol(5)
    e2x, e2y, e2z = tcol(6), tcol(7), tcol(8)
    tri_id = tcol(9)
    ox, oy, oz = rrow(0), rrow(1), rrow(2)
    dx, dy, dz = rrow(3), rrow(4), rrow(5)

    # Moeller-Trumbore on the (TRI_TILE, RAY_TILE) tile
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det))
    tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    hit = (
        (inv_det != 0.0)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > EPS_T)
        & (tri_id >= 0.0)  # padding rows carry id -1
    )
    t = jnp.where(hit, t, INF)

    # per-ray winner within this triangle tile (reduce + one-hot select)
    t_best = jnp.min(t, axis=0)                         # (RAY_TILE,)
    is_best = t == t_best[None, :]
    big = jnp.float32(2.0e9)
    prim_best = jnp.min(jnp.where(is_best, tri_id, big), axis=0)
    first = is_best & (tri_id == prim_best[None, :])
    u_best = jnp.sum(jnp.where(first, u, 0.0), axis=0)
    v_best = jnp.sum(jnp.where(first, v, 0.0), axis=0)

    # merge into the running accumulator
    cur_t = out_ref[0, :]
    take = t_best < cur_t
    out_ref[0, :] = jnp.where(take, t_best, cur_t)
    out_ref[1, :] = jnp.where(take, prim_best, out_ref[1, :])
    out_ref[2, :] = jnp.where(take, u_best, out_ref[2, :])
    out_ref[3, :] = jnp.where(take, v_best, out_ref[3, :])


@partial(jax.jit, static_argnames=("interpret",))
def intersect_tiled(tri_pack: jnp.ndarray, o: jnp.ndarray, d: jnp.ndarray, tmax: jnp.ndarray, interpret: bool = False):
    """tri_pack: (12, Tpad) [p0(3) e1(3) e2(3) id pad pad], Tpad % TRI_TILE == 0.
    o, d: (N, 3); tmax: (N,).  Returns Hit-style tuple
    (t (N,), prim (N,) int32, u, v, valid)."""
    n = o.shape[0]
    n_pad = (-n) % RAY_TILE
    npad = n + n_pad
    ray = jnp.zeros((8, npad), dtype=jnp.float32)
    ray = ray.at[0:3, :n].set(o.T)
    ray = ray.at[3:6, :n].set(d.T)
    tmax_p = jnp.concatenate([tmax, jnp.zeros((n_pad,), tmax.dtype)])[None, :]

    tpad = tri_pack.shape[1]
    grid = (npad // RAY_TILE, tpad // TRI_TILE)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((12, TRI_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RAY_TILE), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, RAY_TILE), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, npad), jnp.float32),
        interpret=interpret,  # CPU testing path
    )(tri_pack, ray, tmax_p)

    t = out[0, :n]
    prim_f = out[1, :n]
    valid = (prim_f >= 0.0) & (t < INF)
    return (
        jnp.where(valid, t, INF),
        jnp.where(valid, prim_f, -1.0).astype(jnp.int32),
        out[2, :n],
        out[3, :n],
        valid,
    )


def pack_triangles(p0, e1, e2) -> jnp.ndarray:
    """Host-side packing to the kernel's (12, Tpad) layout."""
    import numpy as np

    t = p0.shape[0]
    tpad = ((t + TRI_TILE - 1) // TRI_TILE) * TRI_TILE
    pack = np.zeros((12, tpad), dtype=np.float32)
    pack[0:3, :t] = np.asarray(p0, np.float32).T
    pack[3:6, :t] = np.asarray(e1, np.float32).T
    pack[6:9, :t] = np.asarray(e2, np.float32).T
    pack[9, :t] = np.arange(t, dtype=np.float32)
    pack[9, t:] = -1.0
    return jnp.asarray(pack)
