import sys; sys.path.insert(0, ".")
import time, numpy as np, jax, jax.numpy as jnp

N = 262144; P = 1130496
rs = np.random.default_rng(0)
ray = jnp.asarray(rs.integers(0, N, P).astype(np.int32))
t = jnp.asarray(rs.random(P).astype(np.float32))
prim = jnp.asarray(rs.integers(0, 250000, P).astype(np.float32))
pays = jnp.asarray(rs.permutation(P).astype(np.int32))

def bench(f, *a, reps=20):
    r = f(*a); jax.block_until_ready(r)
    x = r[0] if isinstance(r, tuple) else r
    float(jnp.max(x))
    t0 = time.time()
    for _ in range(reps): r = f(*a)
    x = r[0] if isinstance(r, tuple) else r
    float(jnp.max(x))
    return (time.time()-t0)/reps*1e3

@jax.jit
def scat_min(ray, t):
    return jnp.full((N,), 3e38).at[ray].min(t)

@jax.jit
def scat_add(ray, t):
    return jnp.zeros((N,)).at[ray].add(t)

@jax.jit
def back3(pays, t, prim):
    return jax.lax.sort((pays, t, prim), num_keys=1)

@jax.jit
def winner(ray, t, prim):
    tb = jnp.full((N,), 3e38).at[ray].min(t)
    isb = t <= tb[ray]
    pb = jnp.full((N,), 2e9).at[ray].min(jnp.where(isb, prim, 2e9))
    return tb, pb

print("scatter-min  P=1.13M: %.2f ms" % bench(scat_min, ray, t))
print("scatter-add  P=1.13M: %.2f ms" % bench(scat_add, ray, t))
print("back sort 3op P=1.13M: %.2f ms" % bench(back3, pays, t, prim))
print("winner(2 scat+gather): %.2f ms" % bench(winner, ray, t, prim))
