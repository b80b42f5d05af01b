import sys; sys.path.insert(0, ".")
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from mitsuba_path_guiding_tpu.ops.intersect_pairs import (
    _plk_tiles_pallas, LEAF, INF, EPS_T)

# ---- old MT kernel (round-3) inlined
exec(open('/tmp/old_mt.py').read().rsplit('def _mt_tiles(',1)[0])

rs = np.random.default_rng(0)
B = 2000
T_TILES = 6250
P = T_TILES * 128
tri_rows = jnp.asarray(rs.normal(0, 1, (B, 10, 128)).astype(np.float32))
tri_cols = jnp.asarray(rs.normal(0, 1, (B, 16, 5*128)).astype(np.float32))
tile_block = jnp.asarray(rs.integers(0, B, T_TILES).astype(np.int32))
pd7 = jnp.asarray(rs.normal(0, 1, (7, P)).astype(np.float32))
pd16 = jnp.asarray(rs.normal(0, 1, (16, P)).astype(np.float32))

mt = jax.jit(lambda tb, pd: _mt_tiles_pallas(tri_rows, tb, pd, False))
plk = jax.jit(lambda tb, pd: _plk_tiles_pallas(tri_cols, tri_rows, tb, pd, False))

def bench(f, *args, reps=20):
    r = f(*args); jax.block_until_ready(r); float(jnp.max(r[0]))
    t0 = time.time()
    for _ in range(reps):
        r = f(*args)
    float(jnp.max(r[0])); 
    return (time.time() - t0) / reps * 1000

print("old MT pallas:  %.2f ms" % bench(mt, tile_block, pd7))
print("new PLK pallas: %.2f ms" % bench(plk, tile_block, pd16))
