"""Live demo: stream tactile frames, show codebook similarity heatmap.

Reference (filter/live_demo.py:36-123): connect a physical DIGIT over USB,
auto-calibrate the background from the first frames, and for each frame
compute TDN heightmap -> TCN code -> dense cosine similarity against the
whole codebook (no particle filter).

The sensor is a host-boundary concern; `FrameSource` abstracts it:
  * "digit"  — physical sensor via digit_interface (if installed)
  * "replay" — a directory of recorded frames
  * "synthetic" — renderer-driven stream along a random surface walk
    (default; needs no hardware or downloads)

Run:
    python -m midastouch_tpu.apps.live_demo expt.obj_model=sphere
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from midastouch_tpu.apps import common
from midastouch_tpu.codebook import Codebook
from midastouch_tpu.ops import knn
from midastouch_tpu.utils.config import compose


class FrameSource:
    def __init__(self, kind: str, cfg, obj_model: str, replay_dir: str | None = None):
        self.kind = kind
        if kind == "digit":
            from digit_interface import Digit, DigitHandler  # host-only dep

            digits = DigitHandler.list_digits()
            if not digits:
                raise RuntimeError("no DIGIT connected")
            self.dev = Digit(digits[0]["serial"])
            self.dev.connect()
        elif kind == "replay":
            from midastouch_tpu.utils.misc import load_images

            self.frames = load_images(replay_dir)
            self.i = 0
        else:  # synthetic
            from midastouch_tpu.geometry.trajectories import random_surface_walk

            rng = np.random.default_rng(0)
            mesh = common.resolve_mesh(obj_model)
            self.renderer = common.make_renderer(cfg, mesh)
            self.poses = random_surface_walk(mesh, 500, rng)
            self.i = 0

    def get_frame(self) -> np.ndarray | None:
        if self.kind == "digit":
            return np.asarray(self.dev.get_frame())
        if self.kind == "replay":
            if self.i >= len(self.frames):
                return None
            f = self.frames[self.i]
            self.i += 1
            return f
        if self.i >= len(self.poses):
            return None
        rgb, *_ = self.renderer.render(self.poses[self.i], 0.0015)
        self.i += 1
        return np.asarray(rgb * 255.0).astype(np.uint8)


def live_demo(cfg, source: str = "synthetic", max_frames: int | None = None,
              viz=None) -> list[float]:
    obj_model = str(cfg.expt.obj_model)
    mesh = common.resolve_mesh(obj_model)
    renderer = common.make_renderer(cfg, mesh)
    tdn, tcn = common.make_nets(cfg, bg=renderer.get_background("gel"),
                                real=(source == "digit"))
    codebook = Codebook.load(common.codebook_path(obj_model))

    src = FrameSource(source, cfg, obj_model)

    # background auto-calibration from the first frames (live_demo.py:84-94)
    warmup = []
    for _ in range(10):
        f = src.get_frame()
        if f is None:
            break
        warmup.append(tdn.image2heightmap(f))
    if warmup:
        tdn.bg = jnp.mean(jnp.stack(warmup), axis=0)

    key = jax.random.PRNGKey(0)
    peak_sims = []
    count = 0
    while max_frames is None or count < max_frames:
        frame = src.get_frame()
        if frame is None:
            break
        key, k = jax.random.split(key)
        hm = tdn.image2heightmap(frame)
        mask = tdn.heightmap2mask(hm)
        code = tcn.cloud_to_tactile_code(hm, mask, key=k)
        sims = knn.cosine_similarity(code, codebook.embeddings)
        peak_sims.append(float(jnp.max(sims)))
        if viz is not None:
            # the reference heatmaps SOFTMAXED similarity over the whole
            # codebook (live_demo.py:107-109), not raw cosine
            heat = jax.nn.softmax(sims)
            viz.update_demo(frame, np.asarray(hm), np.asarray(mask),
                            np.asarray(heat), np.asarray(codebook.t))
        count += 1
    return peak_sims


def main(argv=None):
    from midastouch_tpu.utils import runtime

    runtime.setup()
    argv = argv if argv is not None else sys.argv[1:]
    source = "synthetic"
    rest = []
    for a in argv:
        if a.startswith("source="):
            source = a.split("=", 1)[1]
        else:
            rest.append(a)
    cfg = compose(rest)
    live_demo(cfg, source=source)


if __name__ == "__main__":
    main()
