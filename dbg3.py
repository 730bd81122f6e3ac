import time, numpy as np, jax, jax.numpy as jnp
from midastouch_tpu.utils import runtime; runtime.setup()
def log(*a): print(*a, flush=True)
from midastouch_tpu.codebook import Codebook
from midastouch_tpu.filter.pf import FilterParams, ParticleFilter
from midastouch_tpu.filter.step import FilterStep
from midastouch_tpu.geometry import procedural
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh
from midastouch_tpu.ops import knn, se3, resample as rs

rng = np.random.default_rng(0)
mesh = procedural.icosphere(radius=0.04, subdivisions=4)
M = N = 50000
with jax.default_device(jax.devices("cpu")[0]):
    poses = sample_poses_on_mesh(mesh, M, rng, edges=False)
    cam = poses.copy(); cam[:, :3, 3] += cam[:, :3, 2]*0.022
    emb = rng.normal(size=(M,256)).astype(np.float32); emb/=np.linalg.norm(emb,axis=1,keepdims=True)
    cb = Codebook.from_poses(poses, cam, emb)
cb = jax.device_put(cb, jax.devices()[0])
pf = ParticleFilter(params=FilterParams(init_trans_noise=mesh.scale/3.0),
                    mesh_vertices=jnp.asarray(mesh.downsampled_vertices(1)), mesh_scale=mesh.scale)
step = FilterStep(pf, cb, floor=1000)
key = jax.random.PRNGKey(0)
state = step.initialize(key, jnp.asarray(poses[0],dtype=jnp.float32), N)
code = jnp.asarray(emb[0]); gt = jnp.asarray(poses[0],dtype=jnp.float32)
oq = jnp.array([1.0,0,0,0]); ot = jnp.array([5e-4,0,0])

def bench(name, f, *args, n=20):
    out = f(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(n): out = f(*args)
    jax.block_until_ready(out)
    log(f"{name:28s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")

keys6 = jax.jit(lambda q,t: se3.se3_key(q,t))
bench("se3_key", keys6, state.q, state.t)
k = se3.se3_key(state.q, state.t)
bench("nn pallas 50kx50k", lambda a,b: knn._nn_pallas(a,b), k, cb.keys)
idx = knn._nn_pallas(k, cb.keys)[1]
bench("gather codes+poses", jax.jit(lambda i: (cb.embeddings[i], cb.q[i], cb.t[i])), idx)
bench("motion", jax.jit(lambda s,kk: pf.motion_model(kk, s, oq, ot)), state, key)
bench("similarity+softmax", jax.jit(lambda c,e,a: pf.get_similarity(c,e,a)), code, cb.embeddings[idx], state.alive)
bench("min_distance drift", jax.jit(lambda t: knn.min_distance(t, pf.mesh_vertices, backend="pallas")), state.t)
bench("cluster_centers", jax.jit(pf.get_cluster_centers), state)
bench("annealing", jax.jit(lambda s: pf.annealing(s, jnp.asarray(0.01), 1000)), state)
bench("resampler", jax.jit(pf.resampler), key, state)
bench("rmse", jax.jit(pf.rmse), state, gt)
bench("cluster_particles", jax.jit(pf.cluster_particles), state)
bench("full update", lambda: step.update(state, key, code, oq, ot, gt, do_cluster=False)[0].t)
