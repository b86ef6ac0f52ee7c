"""Shape plumbing helpers (capability of reference util.py:4-29).

Tiny array-massaging utilities shared by the network runtime, output
rendering, and diagnostics: channel expansion to RGB, batching a single
page, and a value-preserving (nearest-neighbour) resize built on the
re-owned resize op.
"""
from __future__ import annotations

import numpy as np

from .ops.resize import resize_nearest


def gray_to_rgb(img: np.ndarray) -> np.ndarray:
    """Return an ``(..., 3)`` view-compatible array for any gray input.

    Inputs that already carry a trailing 3-channel axis pass through
    untouched; everything else (2-D pages, single-channel stacks) gets its
    last axis broadcast to three identical channels.
    """
    if img.ndim == 3 and img.shape[-1] == 3:
        return img
    if img.ndim == 3 and img.shape[-1] == 1:
        return np.repeat(img, 3, axis=-1)  # (H, W, 1) -> (H, W, 3), not rank 4
    return np.repeat(img[..., None], 3, axis=-1)


def image_to_batch(img: np.ndarray) -> np.ndarray:
    """Reshape one page into a batch-of-one NHWC array.

    2-D ``(H, W)`` inputs gain both the batch and the channel axis;
    anything already carrying channels only gains the batch axis.
    """
    want_channel = (1,) if img.ndim == 2 else ()
    return img.reshape((1,) + img.shape + want_channel)


def preserving_resize(image: np.ndarray, target_shape) -> np.ndarray:
    """Resize preserving values (no anti-aliasing / range change)."""
    return resize_nearest(image, target_shape)
