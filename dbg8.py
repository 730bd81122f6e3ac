import numpy as np, jax, jax.numpy as jnp
from midastouch_tpu.utils import runtime; runtime.setup()
from midastouch_tpu.apps import common
from midastouch_tpu.utils.config import compose
from midastouch_tpu.models.tcn import TCN
from midastouch_tpu.models.voxfpn import voxelize
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh
def log(*a): print(*a, flush=True)

cfg = compose(["expt.obj_model=potato", "tpu.render_max_faces=512"])
mesh = common.resolve_mesh("potato")
renderer = common.make_renderer(cfg, mesh, seed=5)
tcn = TCN(cfg.tcn, cfg.tdn.render)  # trained weights
rng = np.random.default_rng(5)
poses = sample_poses_on_mesh(mesh, 128, rng, edges=False)
hms, masks, rgbs, cams, gels = renderer.render_sensor_poses(poses)
key = jax.random.PRNGKey(0)
clouds = tcn.heightmaps_to_clouds(key, jnp.asarray(hms), jnp.asarray(masks))
occ = voxelize(clouds, tcn.grid_size)
log("occ occupancy frac:", float(jnp.mean(occ)))

# eval mode (running stats)
e_eval = tcn.model.apply(tcn.variables, occ, train=False)
e_eval = e_eval / jnp.linalg.norm(e_eval, axis=1, keepdims=True)
# train mode (batch stats)
e_train, _ = tcn.model.apply(tcn.variables, occ, train=True, mutable=["batch_stats"])
e_train = e_train / jnp.linalg.norm(e_train, axis=1, keepdims=True)
E1, E2 = np.asarray(e_eval), np.asarray(e_train)
i = rng.integers(0,128,500); j = rng.integers(0,128,500)
log("EVAL  random-pair cos:", float(np.mean(np.sum(E1[i]*E1[j],1))))
log("TRAIN random-pair cos:", float(np.mean(np.sum(E2[i]*E2[j],1))))
# distance correlation: do eval codes order by pose distance?
P = gels[:, :3, 3]
d = np.linalg.norm(P[i]-P[j],axis=1)
log("EVAL corr(cos, -dist):", float(np.corrcoef(np.sum(E1[i]*E1[j],1), -d)[0,1]))
log("TRAIN corr(cos, -dist):", float(np.corrcoef(np.sum(E2[i]*E2[j],1), -d)[0,1]))
