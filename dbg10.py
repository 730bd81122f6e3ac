import time, numpy as np, jax, jax.numpy as jnp
from midastouch_tpu.utils import runtime; runtime.setup()
import __graft_entry__ as g
def log(*a): print(*a, flush=True)

# medium scale to iterate fast: 50k particles, 10k codebook
step, state, (code, oq, ot, gt), key = g._tiny_setup(capacity=50000, codebook_size=10000)
T = 20
codes = jnp.tile(code[None], (T,1)); oqs = jnp.tile(oq[None],(T,1)); ots = jnp.tile(ot[None],(T,1)); gts = jnp.tile(gt[None],(T,1,1))

# loop path
s = state
for i in range(3):
    key, k = jax.random.split(key)
    s, st = step.update(s, k, code, oq, ot, gt, do_cluster=False)
jax.block_until_ready(s.t)
t0=time.perf_counter()
for i in range(T):
    key, k = jax.random.split(key)
    s, st = step.update(s, k, code, oq, ot, gt, do_cluster=False)
jax.block_until_ready(s.t)
log("loop no-cluster:", (time.perf_counter()-t0)/T*1e3, "ms/step")

# replay, never cluster
f, seq = step.replay(state, key, oqs, ots, gts, codes=codes, cluster_every=10**6)
jax.block_until_ready(f.t)
t0=time.perf_counter()
f, seq = step.replay(state, key, oqs, ots, gts, codes=codes, cluster_every=10**6)
jax.block_until_ready(f.t)
log("replay no-cluster:", (time.perf_counter()-t0)/T*1e3, "ms/step")

# replay, cluster every 50 (none within 20 steps except i=0)
f, seq = step.replay(state, key, oqs, ots, gts, codes=codes, cluster_every=50)
jax.block_until_ready(f.t)
t0=time.perf_counter()
f, seq = step.replay(state, key, oqs, ots, gts, codes=codes, cluster_every=50)
jax.block_until_ready(f.t)
log("replay cluster@50:", (time.perf_counter()-t0)/T*1e3, "ms/step")
