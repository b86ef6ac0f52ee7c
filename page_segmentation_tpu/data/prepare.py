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


def _more_than_two_values(img: np.ndarray) -> bool:
    """Exactly ``len(np.unique(img)) > 2`` without the sort: np.unique on
    a full-resolution float page costs ~0.6 s of the parity path's
    per-page budget; three vectorized passes answer the same question in
    ~30 ms."""
    flat = img.ravel()
    if flat.size == 0:
        return False
    first = flat[0]
    differs = flat != first
    if not differs.any():
        return False
    second = flat[np.argmax(differs)]
    return bool((differs & (flat != second)).any())


def _scale_image(img: np.ndarray, target_shape, backend: str) -> np.ndarray:
    if backend == "pil":
        return resize_cubic_fast(img, target_shape)
    return resize_cubic(img, target_shape, anti_aliasing=_more_than_two_values(img))


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
    # gather FIRST, normalize the small result: the nearest gather commutes
    # exactly with the pointwise /255, and normalizing before it would
    # materialize a full-resolution float64 page (~70 MB) just to read
    # every 8th pixel of it
    bin_255 = np.max(binary) > 1
    bin_small = np.asarray(rescale_nearest(binary, scale), dtype=np.float64)
    bin_scaled = 1.0 - (bin_small / 255 if bin_255 else bin_small)
    image = np.asarray(image)
    if resize_backend == "pil" and image.dtype == np.uint8:
        # resize the raw uint8 page (PIL's SIMD integer bicubic) and invert
        # after — routing a float64 page through PIL costs ~150 ms/page in
        # mode-'F' conversions alone and the pil path is the declared
        # speed-over-bitwise backend anyway
        img = 1.0 - resize_cubic_fast(image, bin_scaled.shape) / 255
    else:
        img = 1.0 - _scale_image(image.astype(np.float64), bin_scaled.shape, resize_backend) / 255

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
        orig_bin = binary / 255 if bin_255 else binary
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
