import time, numpy as np, jax, jax.numpy as jnp
from midastouch_tpu.utils import runtime; runtime.setup()
from midastouch_tpu.geometry import procedural
from midastouch_tpu.geometry.mesh import sample_poses_on_mesh
from midastouch_tpu.render.digit import DigitRenderer, RenderConfig
rng = np.random.default_rng(0)
mesh = procedural.icosphere(radius=0.04, subdivisions=4)
r = DigitRenderer(RenderConfig(), mesh)
with jax.default_device(jax.devices("cpu")[0]):
    poses = sample_poses_on_mesh(mesh, 128, rng, edges=False)
t0=time.perf_counter()
out = r.render_sensor_poses(poses[:64])
print("first chunk (compile):", time.perf_counter()-t0, flush=True)
t0=time.perf_counter()
out = r.render_sensor_poses(poses[64:128])
dt = time.perf_counter()-t0
print(f"warm 64 poses: {dt:.3f}s -> {64/dt:.1f} renders/s", flush=True)
