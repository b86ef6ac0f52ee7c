"""Shape plumbing helpers (reference util.py capability).

* ``gray_to_rgb`` (reference util.py:4-9)
* ``image_to_batch`` (reference util.py:12-18)
* ``preserving_resize`` (reference util.py:21-29) — order-0, no
  anti-aliasing, over the re-owned nearest resize.
"""
from __future__ import annotations

import numpy as np

from .ops.resize import resize_nearest


def gray_to_rgb(img: np.ndarray) -> np.ndarray:
    if len(img.shape) != 3 or img.shape[2] != 3:
        img = img[..., np.newaxis]
        return np.concatenate(3 * (img,), axis=-1)
    return img


def image_to_batch(img: np.ndarray) -> np.ndarray:
    if len(img.shape) == 2:
        return np.expand_dims(np.expand_dims(img, axis=0), axis=-1)
    return np.expand_dims(img, axis=0)


def preserving_resize(image: np.ndarray, target_shape) -> np.ndarray:
    """Resize preserving values (no anti-aliasing / range change)."""
    return resize_nearest(image, target_shape)
