import time, numpy as np, jax, jax.numpy as jnp, sys
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
def log(*a): print(*a, flush=True)
from midastouch_tpu.codebook import Codebook
from midastouch_tpu.filter.pf import FilterParams, ParticleFilter
from midastouch_tpu.filter.step import FilterStep
from midastouch_tpu.geometry import procedural
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh

rng = np.random.default_rng(0)
mesh = procedural.icosphere(radius=0.04, subdivisions=4)
M, N, E = 50000, 50000, 256
t0=time.perf_counter()
poses = sample_poses_on_mesh(mesh, M, rng, edges=False)
log("sample poses", time.perf_counter()-t0)
cam = poses.copy(); cam[:, :3, 3] += cam[:, :3, 2]*0.022
emb = rng.normal(size=(M, E)).astype(np.float32); emb /= np.linalg.norm(emb,axis=1,keepdims=True)
cb = Codebook.from_poses(poses, cam, emb)
pf = ParticleFilter(params=FilterParams(init_trans_noise=mesh.scale/3.0), mesh_vertices=jnp.asarray(mesh.downsampled_vertices(1)), mesh_scale=mesh.scale)
step = FilterStep(pf, cb, floor=1000)
key = jax.random.PRNGKey(0); key,k0 = jax.random.split(key)
t0=time.perf_counter()
state = step.initialize(k0, jnp.asarray(poses[0],dtype=jnp.float32), N)
jax.block_until_ready(state.t); log("initialize", time.perf_counter()-t0)
gt = jnp.asarray(poses[0],dtype=jnp.float32); code = jnp.asarray(emb[0])
oq = jnp.array([1.0,0,0,0]); ot = jnp.array([5e-4,0,0])

t0=time.perf_counter()
lowered = step._update.lower(cb, state, key, code, oq, ot, gt, jnp.asarray(False), jnp.asarray(True))
log("lower", time.perf_counter()-t0)
t0=time.perf_counter()
compiled = lowered.compile()
log("compile", time.perf_counter()-t0)
t0=time.perf_counter()
state2, stats = compiled(cb, state, key, code, oq, ot, gt, jnp.asarray(False), jnp.asarray(True))
jax.block_until_ready(state2.t); log("run1", time.perf_counter()-t0)
t0=time.perf_counter()
for _ in range(10):
    state2, stats = compiled(cb, state2, key, code, oq, ot, gt, jnp.asarray(False), jnp.asarray(True))
jax.block_until_ready(state2.t); log("run avg", (time.perf_counter()-t0)/10)
