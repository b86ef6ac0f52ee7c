"""Canonical page preprocessing.

The contract (reference dataset.py:131-150 ``prepare_images``):

* ``scale = target_line_height / line_height_px``
* binary: normalized to 0/1, nearest-rescaled by ``scale``, then inverted
  (``1 - x``; ink becomes 1) — uint8 0/1.
* image: cubic-resized to the binary's shape (anti-alias iff >2 unique
  values), normalized, inverted (black background) — uint8 0..255.
* optional ``max_width`` downscale of both.

Two host backends: ``scipy`` (spline, parity path) and ``pil`` (C-speed
bicubic, throughput path).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..ops.resize import (
    rescale_nearest,
    resize_cubic,
    resize_cubic_fast,
    resize_nearest,
)


def _scale_image(img: np.ndarray, target_shape, backend: str) -> np.ndarray:
    if backend == "pil":
        return resize_cubic_fast(img, target_shape)
    anti_aliasing = len(np.unique(img)) > 2
    return resize_cubic(img, target_shape, anti_aliasing=anti_aliasing)


def prepare_images(
    image: np.ndarray,
    binary: np.ndarray,
    target_line_height: int,
    line_height_px: int,
    max_width: Optional[int] = None,
    keep_orig_bin: bool = False,
    resize_backend: str = "scipy",
) -> Tuple[np.ndarray, ...]:
    scale = target_line_height / line_height_px

    binary = np.asarray(binary)
    orig_bin = binary / 255 if np.max(binary) > 1 else binary
    bin_scaled = 1.0 - rescale_nearest(np.asarray(orig_bin, dtype=np.float64), scale)
    img = 1.0 - _scale_image(np.asarray(image, dtype=np.float64), bin_scaled.shape, resize_backend) / 255

    if max_width is not None:
        n_scale = max_width / bin_scaled.shape[1]
        if n_scale < 1.0:
            bin_scaled = rescale_nearest(bin_scaled, n_scale)
            img = _scale_image(img, bin_scaled.shape, resize_backend)

    # reference dataset.py:147 casts straight to uint8, so cubic-overshoot
    # values WRAP modulo 256 (e.g. 271 -> 15); replicated verbatim — models
    # trained on reference-prepared inputs see those exact pixels at sharp
    # ink edges, and clipping instead diverges on every overshoot pixel
    img = (img * 255).astype(np.uint8)
    bin_scaled = bin_scaled.astype(np.uint8)
    if keep_orig_bin:
        return img, bin_scaled, (1 - orig_bin).astype(np.uint8)
    return img, bin_scaled


def prepared_shape(
    binary_shape: Tuple[int, int],
    target_line_height: int,
    line_height_px: int,
    max_width: Optional[int] = None,
) -> Tuple[int, int]:
    """Output shape of ``prepare_images`` without touching any pixels.

    Mirrors the arithmetic above exactly: the prepared shape is the
    binary's shape through ``rescale_nearest(scale)`` (skimage rounding),
    then the optional ``max_width`` downscale.  Lets the lazy dataset
    loader bucket pages for training without loading them.
    """
    from ..ops.resize import output_shape_for_scale

    scale = target_line_height / line_height_px
    shape = output_shape_for_scale(binary_shape[:2], scale)
    if max_width is not None:
        n_scale = max_width / shape[1]
        if n_scale < 1.0:
            shape = output_shape_for_scale(shape, n_scale)
    return shape


def prepare_mask(mask_labels: np.ndarray, scaled_shape) -> np.ndarray:
    """Nearest-resize a label mask to the prepared image shape
    (reference dataset.py:181-184)."""
    return resize_nearest(np.asarray(mask_labels), scaled_shape).astype(np.uint8)
