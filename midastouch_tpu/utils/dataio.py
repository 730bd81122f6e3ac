"""Dataset layout + loaders (reference: tactile_data.pkl and image dirs).

Layout under DIRS['data']/sim/<obj>/<log_id>/:
    tactile_images/<i>.png      uint8 RGB renders
    gt_heightmaps/<i>.png       16-bit gel-frame heightmaps (0.1 px units)
    gt_contactmasks/<i>.png     binary masks
    tactile_data.npz            camposes/gelposes/gelposes_meas (N,4,4) + mNoise

The reference pickles xyzquat pose lists (touch_simulator.py:158-167,
pose.py:272-300); npz of pose matrices is the pickle-free equivalent.
"""

from __future__ import annotations

import os

import numpy as np

from midastouch_tpu.utils import misc


def dataset_path(obj_model: str, log_id, kind: str = "sim") -> str:
    return os.path.join(misc.DIRS["data"], kind, obj_model, str(log_id).zfill(2))


def save_dataset(
    path: str,
    images: np.ndarray,
    heightmaps: np.ndarray,
    masks: np.ndarray,
    camposes: np.ndarray,
    gelposes: np.ndarray,
    gelposes_meas: np.ndarray,
    m_noise: dict | None = None,
) -> None:
    os.makedirs(path, exist_ok=True)
    for sub in ("tactile_images", "gt_heightmaps", "gt_contactmasks"):
        os.makedirs(os.path.join(path, sub), exist_ok=True)
    for i in range(len(images)):
        img = images[i]
        if img.dtype != np.uint8:
            img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        misc.save_image(os.path.join(path, "tactile_images", f"{i}.png"), img)
        misc.save_heightmap(
            os.path.join(path, "gt_heightmaps", f"{i}.png"), heightmaps[i]
        )
        misc.save_image(
            os.path.join(path, "gt_contactmasks", f"{i}.png"),
            (masks[i] * 255).astype(np.uint8),
        )
    noise = m_noise or {}
    np.savez_compressed(
        os.path.join(path, "tactile_data.npz"),
        camposes=camposes.astype(np.float32),
        gelposes=gelposes.astype(np.float32),
        gelposes_meas=gelposes_meas.astype(np.float32),
        sig_r=noise.get("sig_r", 0.0),
        sig_t=noise.get("sig_t", 0.0),
    )


def load_poses(path: str):
    """-> (camposes, gelposes, gelposes_meas) each (N, 4, 4) float32
    (reference extract_poses_sim, pose.py:272-300)."""
    d = np.load(os.path.join(path, "tactile_data.npz"))
    return d["camposes"], d["gelposes"], d["gelposes_meas"]


def load_images(path: str, max_length=None) -> np.ndarray:
    return misc.load_images(os.path.join(path, "tactile_images"), N=max_length)


def load_heightmaps(path: str, max_length=None) -> np.ndarray:
    d = os.path.join(path, "gt_heightmaps")
    names = sorted(os.listdir(d), key=lambda y: int(y.split(".")[0]))
    if max_length not in (None, "None"):
        names = names[: int(max_length)]
    return np.stack([misc.load_heightmap(os.path.join(d, n)) for n in names])


def load_masks(path: str, max_length=None) -> np.ndarray:
    d = os.path.join(path, "gt_contactmasks")
    names = sorted(os.listdir(d), key=lambda y: int(y.split(".")[0]))
    if max_length not in (None, "None"):
        names = names[: int(max_length)]
    return np.stack(
        [misc.load_image(os.path.join(d, n)) > 127 for n in names]
    )


def make_split(
    path: str, ratios=(0.8, 0.1, 0.1), seed: int = 0
) -> dict[str, np.ndarray]:
    """80/10/10 train/val/test index split over a dataset directory
    (reference contrib/tdn_fcrn/data/data_to_txt.py manifests)."""
    n = len(load_poses(path)[0])
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_train = int(n * ratios[0])
    n_val = int(n * ratios[1])
    split = {
        "train": np.sort(perm[:n_train]),
        "val": np.sort(perm[n_train : n_train + n_val]),
        "test": np.sort(perm[n_train + n_val :]),
    }
    np.savez(os.path.join(path, "split.npz"), **split)
    return split


def load_split(path: str) -> dict[str, np.ndarray] | None:
    p = os.path.join(path, "split.npz")
    if not os.path.exists(p):
        return None
    d = np.load(p)
    return {k: d[k] for k in d.files}
