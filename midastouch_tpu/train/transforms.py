"""Coupled image/heightmap augmentations for TDN training.

The reference vendors FCRN's flow_transforms (contrib/tdn_fcrn/
flow_transforms.py): coupled ops applied to (input image, target map)
pairs; its training loader uses Scale + ToTensor only. These are the
jax/numpy equivalents — used host-side in the data pipeline.

NOTE on flips: DIGIT illumination is directional (three fixed LEDs), so a
flipped image implies mirrored lighting; flips are only valid when the
renderer's light ring is symmetric to the flip axis. They're provided for
parity but off by default in the trainer.
"""

from __future__ import annotations

import numpy as np


def scale(image: np.ndarray, target: np.ndarray, size: tuple[int, int]):
    """Resize both to (H, W) (reference Scale/Scale_Single)."""
    import cv2

    h, w = size
    img = cv2.resize(image, (w, h), interpolation=cv2.INTER_LINEAR)
    tgt = cv2.resize(target, (w, h), interpolation=cv2.INTER_LINEAR)
    return img, tgt


def center_crop(image: np.ndarray, target: np.ndarray, size: tuple[int, int]):
    h, w = size
    ih, iw = image.shape[:2]
    y0, x0 = (ih - h) // 2, (iw - w) // 2
    return image[y0 : y0 + h, x0 : x0 + w], target[y0 : y0 + h, x0 : x0 + w]


def random_crop(
    image: np.ndarray, target: np.ndarray, size: tuple[int, int],
    rng: np.random.Generator,
):
    h, w = size
    ih, iw = image.shape[:2]
    y0 = rng.integers(0, max(ih - h, 0) + 1)
    x0 = rng.integers(0, max(iw - w, 0) + 1)
    return image[y0 : y0 + h, x0 : x0 + w], target[y0 : y0 + h, x0 : x0 + w]


def random_horizontal_flip(
    image: np.ndarray, target: np.ndarray, rng: np.random.Generator,
    p: float = 0.5,
):
    if rng.random() < p:
        return image[:, ::-1].copy(), target[:, ::-1].copy()
    return image, target


def random_vertical_flip(
    image: np.ndarray, target: np.ndarray, rng: np.random.Generator,
    p: float = 0.5,
):
    if rng.random() < p:
        return image[::-1].copy(), target[::-1].copy()
    return image, target


def compose(transforms):
    def apply(image, target, rng=None):
        for t in transforms:
            try:
                image, target = t(image, target, rng)
            except TypeError:
                image, target = t(image, target)
        return image, target

    return apply
