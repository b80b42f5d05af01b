import sys; sys.path.insert(0, ".")
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.0e38; EPS_T = 1e-4; LEAF = 128

rs = np.random.default_rng(0)
B = 2000; T_TILES = 6250; P = T_TILES * 128
tri_rows = jnp.asarray(rs.normal(0, 1, (B, 10, 128)).astype(np.float32))
tri_cols = jnp.asarray(rs.normal(0, 1, (B, 16, 5*128)).astype(np.float32))
tile_block = jnp.asarray(rs.integers(0, B, T_TILES).astype(np.int32))
pd16 = jnp.asarray(rs.normal(0, 1, (16, P)).astype(np.float32))

def make_kernel(do_dot=True, do_epi=True, prec=jax.lax.Precision.HIGHEST):
    def kern(tb_ref, tc_ref, tr_ref, pd_ref, out_ref):
        i = pl.program_id(0)
        tile = out_ref.shape[1]
        if do_dot:
            acc = jax.lax.dot_general(pd_ref[...], tc_ref[0],
                (((0,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32)
        else:
            acc = jnp.broadcast_to(pd_ref[0, :][:, None], (tile, 5*LEAF)) * 1.000001
        if do_epi:
            g = [acc[:, k*LEAF:(k+1)*LEAF] for k in range(5)]
            s0, s1, s2, num, den = g
            smin = jnp.minimum(jnp.minimum(s0, s1), s2)
            smax = jnp.maximum(jnp.maximum(s0, s1), s2)
            eps = 1e-6 * (jnp.abs(s0)+jnp.abs(s1)+jnp.abs(s2))
            inside = (smin >= -eps) | (smax <= eps)
            okd = den != 0.0
            t = num / jnp.where(okd, den, 1.0)
            tid = tr_ref[0, 9, :][None, :]
            tmax = pd_ref[10, :][:, None]
            hit = inside & okd & (t > EPS_T) & (t < tmax) & (tid >= 0.0)
            t = jnp.where(hit, t, INF)
            tb = jnp.min(t, axis=1)
            big = jnp.float32(2e9)
            isb = t == tb[:, None]
            prim = jnp.min(jnp.where(isb, tid + jnp.zeros_like(t), big), axis=1)
            out_ref[0, :] = tb
            out_ref[1, :] = jnp.where(tb < INF, prim, -1.0)
        else:
            out_ref[0, :] = jnp.sum(acc[:, :LEAF], axis=1)
            out_ref[1, :] = acc[:, 0]
    return kern

def run(kern):
    bmax = B - 1
    return pl.pallas_call(kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(T_TILES,),
            in_specs=[
                pl.BlockSpec((1, 16, 5*LEAF), lambda i, blk: (jnp.clip(blk[i],0,bmax),0,0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 10, LEAF), lambda i, blk: (jnp.clip(blk[i],0,bmax),0,0), memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 128), lambda i, blk: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, 128), lambda i, blk: (0, i), memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((2, P), jnp.float32),
    )(tile_block, tri_cols, tri_rows, pd16)

def bench(f, reps=20):
    r = f(); float(jnp.max(r[0]))
    t0 = time.time()
    for _ in range(reps): r = f()
    float(jnp.max(r[0]))
    return (time.time()-t0)/reps*1000

H = jax.lax.Precision.HIGHEST; D = jax.lax.Precision.DEFAULT
for name, k in [
    ("dot(H)+epi", make_kernel(True, True, H)),
    ("dot(D)+epi", make_kernel(True, True, D)),
    ("dot(H) only", make_kernel(True, False, H)),
    ("dot(D) only", make_kernel(True, False, D)),
    ("epi only", make_kernel(False, True, H)),
]:
    f = jax.jit(lambda kk=k: run(kk))
    print(name, "%.2f ms" % bench(f))
