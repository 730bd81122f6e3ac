import time, numpy as np, jax, jax.numpy as jnp
from midastouch_tpu.utils import runtime; runtime.setup()
from midastouch_tpu.ops import knn
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(50000,6)).astype(np.float32))
p = jnp.asarray(rng.normal(size=(50000,6)).astype(np.float32))
d1,i1 = knn._nn_pallas(q, p); jax.block_until_ready((d1,i1))
d2,i2 = knn._nn_xla(q[:3000], p)
print("match:", float(jnp.mean((i1[:3000]==i2).astype(jnp.float32))), flush=True)
for n in (10, 50):
    t0=time.perf_counter()
    for _ in range(n):
        d1,i1 = knn._nn_pallas(q, p)
    jax.block_until_ready((d1,i1))
    print(f"pallas avg over {n}: {(time.perf_counter()-t0)/n*1e3:.3f} ms", flush=True)
# sequential blocking each call
t0=time.perf_counter()
for _ in range(10):
    d1,i1 = knn._nn_pallas(q, p); jax.block_until_ready((d1,i1))
print(f"pallas blocking each: {(time.perf_counter()-t0)/10*1e3:.3f} ms", flush=True)
