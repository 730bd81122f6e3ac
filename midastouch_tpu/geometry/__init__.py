from midastouch_tpu.geometry.mesh import Mesh, load_mesh  # noqa: F401
from midastouch_tpu.geometry import procedural  # noqa: F401
