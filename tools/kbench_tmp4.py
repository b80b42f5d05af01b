import sys; sys.path.insert(0, ".")
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.0e38; EPS_T = 1e-4; LEAF = 128
rs = np.random.default_rng(0)
B = 2000; T_TILES = 6250; P = T_TILES * 128
G = int(sys.argv[1]) if len(sys.argv) > 1 else 8
TG = (T_TILES + G - 1) // G
tri_rows = jnp.asarray(rs.normal(0, 1, (B, 10, 128)).astype(np.float32))
tri_cols = jnp.asarray(rs.normal(0, 1, (B, 16, 5*128)).astype(np.float32))
tile_block = jnp.asarray(rs.integers(0, B, TG * G).astype(np.int32))
pd16 = jnp.asarray(rs.normal(0, 1, (16, TG * G * 128)).astype(np.float32))

def kern(tb_ref, *refs):
    # refs: G tri_cols blocks, G tri_rows blocks, pd (16, G*128), out (2, G*128)
    tc = refs[:G]; tr = refs[G:2*G]; pd_ref = refs[2*G]; out_ref = refs[2*G+1]
    for g in range(G):
        pdg = pd_ref[:, g*128:(g+1)*128]
        acc = jax.lax.dot_general(pdg, tc[g][0],
            (((0,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        s0 = acc[:, 0:LEAF]; s1 = acc[:, LEAF:2*LEAF]; s2 = acc[:, 2*LEAF:3*LEAF]
        num = acc[:, 3*LEAF:4*LEAF]; den = acc[:, 4*LEAF:5*LEAF]
        smin = jnp.minimum(jnp.minimum(s0, s1), s2)
        smax = jnp.maximum(jnp.maximum(s0, s1), s2)
        eps = 1e-6 * (jnp.abs(s0)+jnp.abs(s1)+jnp.abs(s2))
        inside = (smin >= -eps) | (smax <= eps)
        okd = den != 0.0
        t = num / jnp.where(okd, den, 1.0)
        tid = tr[g][0, 9, :][None, :]
        tmax = pdg[10, :][:, None]
        hit = inside & okd & (t > EPS_T) & (t < tmax) & (tid >= 0.0)
        t = jnp.where(hit, t, INF)
        tb = jnp.min(t, axis=1)
        big = jnp.float32(2e9)
        isb = t == tb[:, None]
        prim = jnp.min(jnp.where(isb, tid + jnp.zeros_like(t), big), axis=1)
        out_ref[0, g*128:(g+1)*128] = tb
        out_ref[1, g*128:(g+1)*128] = jnp.where(tb < INF, prim, -1.0)

bmax = B - 1
def make_spec(g):
    return pl.BlockSpec((1, 16, 5*LEAF), lambda i, blk, g=g: (jnp.clip(blk[i*G+g],0,bmax), 0, 0), memory_space=pltpu.VMEM)
def make_spec_r(g):
    return pl.BlockSpec((1, 10, LEAF), lambda i, blk, g=g: (jnp.clip(blk[i*G+g],0,bmax), 0, 0), memory_space=pltpu.VMEM)

f = jax.jit(lambda: pl.pallas_call(kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(TG,),
        in_specs=[make_spec(g) for g in range(G)] + [make_spec_r(g) for g in range(G)] + [
            pl.BlockSpec((16, G*128), lambda i, blk: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, G*128), lambda i, blk: (0, i), memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct((2, TG*G*128), jnp.float32),
)(tile_block, *( [tri_cols]*G + [tri_rows]*G + [pd16] )))

r = f(); float(jnp.max(r[0]))
t0 = time.time()
for _ in range(20): r = f()
float(jnp.max(r[0]))
print(f"G={G}: %.2f ms" % ((time.time()-t0)/20*1000))
