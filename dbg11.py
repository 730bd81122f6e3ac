import time, numpy as np, jax, jax.numpy as jnp
from midastouch_tpu.utils import runtime; runtime.setup()
from midastouch_tpu.codebook import Codebook
from midastouch_tpu.filter.pf import FilterParams, ParticleFilter
from midastouch_tpu.filter.step import FilterStep
from midastouch_tpu.geometry import procedural
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh
def log(*a): print(*a, flush=True)

rng = np.random.default_rng(0)
mesh = procedural.icosphere(radius=0.04, subdivisions=4)
with jax.default_device(jax.devices("cpu")[0]):
    poses = sample_poses_on_mesh(mesh, 50000, rng, edges=False)
    cam = poses.copy(); cam[:, :3, 3] += cam[:, :3, 2]*0.022
    emb = rng.normal(size=(50000,256)).astype(np.float32); emb/=np.linalg.norm(emb,axis=1,keepdims=True)
    cb = Codebook.from_poses(poses, cam, emb)
cb = jax.device_put(cb, jax.devices()[0])

T = 20
for backend in ("pallas", "xla"):
    pf = ParticleFilter(params=FilterParams(init_trans_noise=mesh.scale/3.0, backend=backend),
                        mesh_vertices=jnp.asarray(mesh.downsampled_vertices(1)), mesh_scale=mesh.scale)
    step = FilterStep(pf, cb, floor=1000)
    key = jax.random.PRNGKey(0)
    state = step.initialize(key, jnp.asarray(poses[0],dtype=jnp.float32), 50000)
    code = jnp.asarray(emb[0]); gt = jnp.asarray(poses[0],dtype=jnp.float32)
    oq = jnp.array([1.0,0,0,0]); ot = jnp.array([5e-4,0,0])
    codes = jnp.tile(code[None],(T,1)); oqs = jnp.tile(oq[None],(T,1)); ots=jnp.tile(ot[None],(T,1)); gts=jnp.tile(gt[None],(T,1,1))
    f,_ = step.replay(state, key, oqs, ots, gts, codes=codes, cluster_every=50)
    jax.block_until_ready(f.t)
    t0=time.perf_counter()
    f,_ = step.replay(state, key, oqs, ots, gts, codes=codes, cluster_every=50)
    jax.block_until_ready(f.t)
    log(f"replay {backend}: {(time.perf_counter()-t0)/T*1e3:.1f} ms/step")
