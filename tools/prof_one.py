import sys; sys.path.insert(0, ".")
import time, numpy as np, jax, jax.numpy as jnp
from mitsuba_path_guiding_tpu.accel.bvh import build_bvh
from mitsuba_path_guiding_tpu.accel.pairs import build_pair_table
from mitsuba_path_guiding_tpu.ops.intersect_pairs import intersect_pairs_raw
from tools.profile_blocklist import make_interior, camera_rays, bounce_rays

INF = 3.0e38
n_rays = 262144
p0, e1, e2 = make_interior(250_000)
bvh = build_bvh(p0, e1, e2)
pt = build_pair_table(p0, e1, e2, bvh, leaf=128, sb_blk=32)
o, d = camera_rays(n_rays)
o, d = jnp.asarray(o), jnp.asarray(d)
tmax = jnp.full((n_rays,), INF)
fp = jax.jit(lambda o, d, t: intersect_pairs_raw(pt, o, d, t))
r = fp(o, d, tmax); float(jnp.max(r[0]))
# bounce rays for realism
t_np = np.where(np.asarray(r[4]), np.asarray(r[0]), 1.0)
prim_np = np.maximum(np.asarray(r[1]), 0)
ob, db = bounce_rays(p0, e1, e2, np.asarray(o), np.asarray(d), t_np, prim_np)
ob, db = jnp.asarray(ob), jnp.asarray(db)
r = fp(ob, db, tmax); float(jnp.max(r[0]))
jax.profiler.start_trace("/tmp/trace_pairs")
for _ in range(5):
    r = fp(ob, db, tmax)
float(jnp.max(r[0]))
jax.profiler.stop_trace()
print("done")
