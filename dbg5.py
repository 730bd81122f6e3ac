import time, numpy as np, jax, jax.numpy as jnp
from midastouch_tpu.utils import runtime; runtime.setup()
from midastouch_tpu.ops import knn
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(50000,6)).astype(np.float32))
p = jnp.asarray(rng.normal(size=(50000,6)).astype(np.float32))
for tq, tm in [(256,2048),(512,2048),(512,4096),(1024,4096),(256,8192),(1024,8192),(2048, 8192)]:
    try:
        d,i = knn._nn_pallas(q,p,tq,tm); jax.block_until_ready((d,i))
        t0=time.perf_counter()
        for _ in range(30): d,i = knn._nn_pallas(q,p,tq,tm)
        jax.block_until_ready((d,i))
        print(f"TQ={tq} TM={tm}: {(time.perf_counter()-t0)/30*1e3:.3f} ms", flush=True)
    except Exception as e:
        print(tq, tm, "FAIL", str(e)[:100], flush=True)
# also xla fallback timing
d,i = knn._nn_xla(q,p); jax.block_until_ready((d,i))
t0=time.perf_counter()
for _ in range(30): d,i = knn._nn_xla(q,p)
jax.block_until_ready((d,i))
print(f"xla: {(time.perf_counter()-t0)/30*1e3:.3f} ms", flush=True)
