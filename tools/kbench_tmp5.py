import sys; sys.path.insert(0, ".")
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAF = 128
rs = np.random.default_rng(0)
B = 2000; T_TILES = 6250; P = T_TILES * 128
mode = sys.argv[1]  # dma | dmarows | noop
tri_rows = jnp.asarray(rs.normal(0, 1, (B, 10, 128)).astype(np.float32))
tri_cols = jnp.asarray(rs.normal(0, 1, (B, 16, 5*128)).astype(np.float32))
tile_block = jnp.asarray(rs.integers(0, B, T_TILES).astype(np.int32))
pd16 = jnp.asarray(rs.normal(0, 1, (16, P)).astype(np.float32))
bmax = B - 1

if mode == "dma":
    # DMA tri_cols + pd, minimal compute
    def kern(tb_ref, tc_ref, pd_ref, out_ref):
        out_ref[0, :] = pd_ref[0, :] + tc_ref[0, 0, 0]
        out_ref[1, :] = pd_ref[1, :]
    specs = [pl.BlockSpec((1, 16, 5*LEAF), lambda i, blk: (jnp.clip(blk[i],0,bmax),0,0), memory_space=pltpu.VMEM),
             pl.BlockSpec((16, 128), lambda i, blk: (0, i), memory_space=pltpu.VMEM)]
    args = (tile_block, tri_cols, pd16)
elif mode == "dmarows":
    # DMA only tri_rows (5KB) + pd
    def kern(tb_ref, tr_ref, pd_ref, out_ref):
        out_ref[0, :] = pd_ref[0, :] + tr_ref[0, 0, 0]
        out_ref[1, :] = pd_ref[1, :]
    specs = [pl.BlockSpec((1, 10, LEAF), lambda i, blk: (jnp.clip(blk[i],0,bmax),0,0), memory_space=pltpu.VMEM),
             pl.BlockSpec((16, 128), lambda i, blk: (0, i), memory_space=pltpu.VMEM)]
    args = (tile_block, tri_rows, pd16)
else:
    # no tri input at all
    def kern(tb_ref, pd_ref, out_ref):
        out_ref[0, :] = pd_ref[0, :]
        out_ref[1, :] = pd_ref[1, :]
    specs = [pl.BlockSpec((16, 128), lambda i, blk: (0, i), memory_space=pltpu.VMEM)]
    args = (tile_block, pd16)

f = jax.jit(lambda: pl.pallas_call(kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(T_TILES,),
        in_specs=specs,
        out_specs=pl.BlockSpec((2, 128), lambda i, blk: (0, i), memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct((2, P), jnp.float32),
)(*args))
r = f(); float(jnp.max(r[0]))
t0 = time.time()
for _ in range(20): r = f()
float(jnp.max(r[0]))
print(mode, "%.2f ms" % ((time.time()-t0)/20*1000))
