import numpy as np, jax, jax.numpy as jnp
from midastouch_tpu.utils import runtime; runtime.setup()
from midastouch_tpu.utils.config import compose
from midastouch_tpu.apps.build_codebook import build_codebook
from midastouch_tpu.eval.single_touch import top_n_error
def log(*a): print(*a, flush=True)

cfg = compose(["expt.obj_model=potato", "expt.codebook_size=3000", "tpu.render_max_faces=512"])
cb_gt = build_codebook(cfg, use_gt_heightmaps=True, seed=11, save=False)
r = top_n_error(cb_gt, n=25)
log("GT-heightmap codebook single-touch:", {k: round(v,4) for k,v in r.items()})

# distance-vs-cosine structure
E = np.asarray(cb_gt.embeddings); P = np.asarray(cb_gt.t)
rng = np.random.default_rng(0)
i = rng.integers(0,len(E),4000); j = rng.integers(0,len(E),4000)
cos = np.sum(E[i]*E[j],1); d = np.linalg.norm(P[i]-P[j],axis=1)
log("corr(cos, -dist):", round(float(np.corrcoef(cos,-d)[0,1]),4))
for lo,hi in [(0,0.003),(0.003,0.01),(0.01,0.03),(0.03,0.2)]:
    m = (d>=lo)&(d<hi)
    if m.any(): log(f"dist {lo*1000:.0f}-{hi*1000:.0f}mm: cos {cos[m].mean():.3f} (n={m.sum()})")
