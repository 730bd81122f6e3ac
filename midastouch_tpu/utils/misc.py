"""Paths, timing, and host I/O utilities (reference: modules/misc.py)."""

from __future__ import annotations

import os
import shutil
import time

import numpy as np

# Path registry anchored at the repo root (reference DIRS, misc.py:37-45).
# Override the root with MIDASTOUCH_TPU_ROOT for external asset stores.
ROOT = os.environ.get(
    "MIDASTOUCH_TPU_ROOT",
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

DIRS = {
    "root": ROOT,
    "data": os.path.join(ROOT, "data"),
    "weights": os.path.join(ROOT, "data", "weights"),
    "trees": os.path.join(ROOT, "data", "codebooks"),
    "obj_models": os.path.join(ROOT, "data", "obj_models"),
    "debug": os.path.join(ROOT, "data", "debug"),
}


def get_device(cpu: bool = False, verbose: bool = True):
    """Pick the compute device (reference misc.py:48-75 used GPUtil)."""
    import jax

    if cpu:
        return jax.devices("cpu")[0]
    dev = jax.devices()[0]
    if verbose:
        print(f"Using device: {dev}")
    return dev


def remove_and_mkdir(path: str) -> None:
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)


def get_time(start: float) -> float:
    return time.time() - start


class StageTimer:
    """Per-stage wall timers matching the reference's {tactile, motion, meas}
    breakdown (filter.py:96-97,142-193). Call .sync() with device arrays to
    include device time (block_until_ready)."""

    def __init__(self, stages=("tactile", "motion", "meas")):
        self.stages = list(stages)
        self.current: dict[str, float] = {}
        self.history: dict[str, list[float]] = {s: [] for s in self.stages}
        self._t0 = None
        self._stage = None

    def start(self, stage: str) -> None:
        self._stage = stage
        self._t0 = time.perf_counter()

    def stop(self, *arrays) -> float:
        if arrays:
            import jax

            jax.block_until_ready(arrays)
        dt = time.perf_counter() - self._t0
        self.current[self._stage] = dt
        self.history.setdefault(self._stage, []).append(dt)
        return dt

    def iteration_time(self) -> float:
        return sum(self.current.values())

    def averages(self) -> dict[str, float]:
        return {
            k: (sum(v) / len(v) if v else 0.0) for k, v in self.history.items()
        }


# ---------------------------------------------------------------------------
# image / video I/O (host boundary)
# ---------------------------------------------------------------------------


def save_image(path: str, img: np.ndarray) -> None:
    from PIL import Image

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.array(Image.open(path))


def save_heightmap(path: str, hm: np.ndarray) -> None:
    """Store gel-frame heightmaps losslessly as 16-bit PNG in 0.1-px units."""
    from PIL import Image

    arr = np.clip(np.round(np.asarray(hm) * 10.0), 0, 65535).astype(np.uint16)
    Image.fromarray(arr).save(path)


def load_heightmap(path: str) -> np.ndarray:
    from PIL import Image

    return np.array(Image.open(path)).astype(np.float32) / 10.0


def load_images(image_dir: str, N=None) -> np.ndarray:
    """Load a numerically-sorted directory of frames (misc.py:215-232)."""
    names = sorted(
        (n for n in os.listdir(image_dir) if n.split(".")[-1] in ("png", "jpg")),
        key=lambda y: int(y.split(".")[0]),
    )
    if N not in (None, "None"):
        names = names[: int(N)]
    return np.stack([load_image(os.path.join(image_dir, n)) for n in names])


def images_to_video(image_dir: str, out_name: str = "results.mp4", fps: int = 10):
    """Stitch saved frames into a video (misc.py:303-331 used an ffmpeg
    pipe; imageio wraps the same)."""
    import imageio.v2 as imageio

    names = sorted(
        (n for n in os.listdir(image_dir) if n.endswith(".png")),
        key=lambda y: int(y.split(".")[0]),
    )
    if not names:
        return None
    out = os.path.join(image_dir, out_name)
    try:
        with imageio.get_writer(out, fps=fps) as w:
            for n in names:
                w.append_data(imageio.imread(os.path.join(image_dir, n)))
    except (ValueError, ImportError):
        # no mp4 backend in this environment (the reference piped through a
        # system ffmpeg, misc.py:303-331): fall back to an animated GIF via
        # the always-available Pillow backend
        out = os.path.splitext(out)[0] + ".gif"
        try:
            with imageio.get_writer(
                out, duration=1000.0 / max(fps, 1), loop=0
            ) as w:
                for n in names:
                    w.append_data(imageio.imread(os.path.join(image_dir, n)))
        except (ValueError, ImportError) as e:
            print(f"[viz] no video/gif writer ({e}); frames kept as PNGs")
            return None
    return out


def confusion_matrix(embeddings: np.ndarray, chunk: int = 1024) -> np.ndarray:
    """Pairwise cosine-similarity matrix (reference misc.py:78-108)."""
    import jax.numpy as jnp

    e = jnp.asarray(embeddings, dtype=jnp.float32)
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=1, keepdims=True), 1e-12)
    return np.asarray(e @ e.T)
