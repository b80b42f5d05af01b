import sys; sys.path.insert(0, ".")
import time, numpy as np, jax, jax.numpy as jnp
exec(open("tools/kbench_tmp2.py").read().split("def bench")[0].replace('import sys; sys.path.insert(0, ".")',''))
H = jax.lax.Precision.HIGHEST
import sys as _s
which = _s.argv[1]
variants = {
 "he": make_kernel(True, True, H),
 "de": make_kernel(True, True, jax.lax.Precision.DEFAULT),
 "h": make_kernel(True, False, H),
 "d": make_kernel(True, False, jax.lax.Precision.DEFAULT),
 "e": make_kernel(False, True, H),
}
k = variants[which]
f = jax.jit(lambda: run(k))
r = f(); print("ok", float(jnp.max(r[0])))
t0 = time.time()
for _ in range(20): r = f()
float(jnp.max(r[0]))
print(which, "%.2f ms" % ((time.time()-t0)/20*1000))
