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
index = cb.build_ann_index()
log("index cells:", index.num_cells, "cap:", index.cell_capacity)

T = 50
for n_particles in (50000, 100000):
    for ann in (None, index):
        pf = ParticleFilter(params=FilterParams(init_trans_noise=mesh.scale/3.0),
                            mesh_vertices=jnp.asarray(mesh.downsampled_vertices(1)), mesh_scale=mesh.scale)
        step = FilterStep(pf, cb, floor=1000, ann_index=ann)
        key = jax.random.PRNGKey(0)
        state = step.initialize(key, jnp.asarray(poses[0],dtype=jnp.float32), n_particles)
        code = jnp.asarray(emb[0]); gt = jnp.asarray(poses[0],dtype=jnp.float32)
        oq = jnp.array([1.0,0,0,0]); ot = jnp.array([5e-4,0,0])
        codes = jnp.tile(code[None],(T,1)); oqs=jnp.tile(oq[None],(T,1)); ots=jnp.tile(ot[None],(T,1)); gts=jnp.tile(gt[None],(T,1,1))
        f,_ = step.replay(state, key, oqs, ots, gts, codes=codes, cluster_every=50)
        jax.block_until_ready(f.t)
        times=[]
        for _ in range(3):
            t0=time.perf_counter()
            f,_ = step.replay(state, key, oqs, ots, gts, codes=codes, cluster_every=50)
            jax.block_until_ready(f.t)
            times.append(time.perf_counter()-t0)
        ms = np.median(times)/T*1e3
        log(f"N={n_particles} ann={'on' if ann is not None else 'off'}: {ms:.2f} ms/step ({1000/ms:.0f} steps/s)")
