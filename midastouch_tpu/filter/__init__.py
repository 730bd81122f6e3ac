from midastouch_tpu.filter.particles import ParticleState  # noqa: F401
from midastouch_tpu.filter.pf import ParticleFilter, FilterParams  # noqa: F401
