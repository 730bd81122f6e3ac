import numpy as np, jax, jax.numpy as jnp
from midastouch_tpu.utils import runtime; runtime.setup()
from midastouch_tpu.codebook import Codebook
from midastouch_tpu.apps import common
from midastouch_tpu.utils.config import compose
def log(*a): print(*a, flush=True)

cb = Codebook.load(common.codebook_path("potato"))
E = np.asarray(cb.embeddings); P = np.asarray(cb.t)
rng = np.random.default_rng(0)
i = rng.integers(0, len(E), 2000); j = rng.integers(0, len(E), 2000)
cos = np.sum(E[i]*E[j], axis=1)
log("random-pair cosine: mean", cos.mean(), "std", cos.std(), "min", cos.min())
# near-pair cosine (poses within 2mm)
d = np.linalg.norm(P[i]-P[j], axis=1)
near = d < 0.004
log("near-pair (<4mm) cosine mean:", cos[near].mean() if near.any() else "n/a", "count", near.sum())
far = d > 0.03
log("far-pair (>30mm) cosine mean:", cos[far].mean())
# embedding effective dimensionality
s = np.linalg.svd(E - E.mean(0), compute_uv=False)
log("top svals:", (s[:6]/s.sum()).round(3), "eff dim:", (s.sum()**2/ (s**2).sum()).round(1))
