"""Otsu binarization (re-owned; the reference calls cv2.threshold with
THRESH_BINARY+THRESH_OTSU in image_ops.py:63)."""
from __future__ import annotations

import numpy as np


def otsu_threshold(gray: np.ndarray) -> int:
    """Return the Otsu threshold for a uint8 image (cv2-compatible).

    cv2 maximizes the between-class variance over thresholds t where pixels
    <= t are class 0 and > t are class 1, returning the best t.
    """
    gray = np.asarray(gray, dtype=np.uint8)
    hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0

    bin_vals = np.arange(256, dtype=np.float64)
    weight0 = np.cumsum(hist)
    weight1 = total - weight0
    cum_mean = np.cumsum(hist * bin_vals)
    total_mean = cum_mean[-1]

    with np.errstate(divide="ignore", invalid="ignore"):
        mean0 = cum_mean / weight0
        mean1 = (total_mean - cum_mean) / weight1
        between = weight0 * weight1 * (mean0 - mean1) ** 2
    between = np.nan_to_num(between, nan=-1.0)
    return int(np.argmax(between))


def otsu_binarize(gray: np.ndarray, invert: bool = False) -> np.ndarray:
    """0/255 uint8 binarization: pixels strictly above threshold become 255.

    ``invert=False`` then subtracts from 255, mirroring reference
    image_ops.py:63-66 (``cv2.subtract(255, img)`` unless ``--inverse``).
    """
    thresh = otsu_threshold(gray)
    binary = np.where(np.asarray(gray) > thresh, np.uint8(255), np.uint8(0))
    if not invert:
        binary = (255 - binary).astype(np.uint8)
    return binary


def binarize_into(gray: np.ndarray, out: np.ndarray, threshold: int = 128) -> np.ndarray:
    """Write ``gray >= threshold -> 255 else 0`` into ``out`` (uint8), no
    temporaries — the streaming pipeline binarizes decoded pages straight
    into its reusable ring buffers (image_io.imread_bin semantics; the
    reference falls back to binarizing the image itself when no separate
    binary exists, dataset.py:172).

    ``>= threshold`` with ``threshold = otsu_threshold(gray) + 1`` is the
    cv2 Otsu convention (strictly-above-t pixels become 255).
    """
    if out.dtype != np.uint8 or out.shape != gray.shape:
        raise ValueError(f"out must be uint8 of shape {gray.shape}")
    view = out.view(np.bool_) if out.flags.c_contiguous else None
    if view is not None:
        np.greater_equal(gray, threshold, out=view)
        np.multiply(out, 255, out=out)
    else:
        out[...] = np.where(gray >= threshold, np.uint8(255), np.uint8(0))
    return out
