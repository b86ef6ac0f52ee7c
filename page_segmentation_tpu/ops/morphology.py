"""Morphology primitives (dilate/erode/open/close).

The reference uses cv2 morphology (pc_segmentation.py:63-67 ``dilate`` 3x3;
:82-95 rectangular close/open/dilate sized by char_height).  Re-owned here:

* host path: scipy.ndimage max/min filters with cv2-compatible border
  behavior (constant border that never introduces foreground).
* device path: jax ``lax.reduce_window`` max/min — fuses into the on-TPU
  postprocessing pipeline.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def _kernel_shape(kernel) -> Tuple[int, int]:
    if isinstance(kernel, np.ndarray):
        return kernel.shape[:2]
    kh, kw = kernel
    return int(kh), int(kw)


def dilate(image: np.ndarray, kernel=(3, 3), iterations: int = 1) -> np.ndarray:
    """Grayscale/binary dilation with a rectangular kernel (cv2.dilate).

    Works per channel on (H, W, C) inputs, like cv2 on color images.
    """
    from scipy import ndimage as ndi

    kh, kw = _kernel_shape(kernel)
    size = (kh, kw) + (1,) * (image.ndim - 2)
    out = np.asarray(image)
    for _ in range(int(iterations)):
        out = ndi.maximum_filter(out, size=size, mode="constant", cval=np.iinfo(out.dtype).min if out.dtype.kind in "iu" else -np.inf)
    return out


def erode(image: np.ndarray, kernel=(3, 3), iterations: int = 1) -> np.ndarray:
    from scipy import ndimage as ndi

    kh, kw = _kernel_shape(kernel)
    size = (kh, kw) + (1,) * (image.ndim - 2)
    out = np.asarray(image)
    for _ in range(int(iterations)):
        out = ndi.minimum_filter(out, size=size, mode="constant", cval=np.iinfo(out.dtype).max if out.dtype.kind in "iu" else np.inf)
    return out


def morph_close(image: np.ndarray, kernel=(3, 3)) -> np.ndarray:
    return erode(dilate(image, kernel), kernel)


def morph_open(image: np.ndarray, kernel=(3, 3)) -> np.ndarray:
    return dilate(erode(image, kernel), kernel)


# ------------------------------------------------------------------- device
def dilate_jax(image, kernel=(3, 3)):
    """Max-pool dilation on device; image is (H, W) or (H, W, C)."""
    import jax.numpy as jnp
    from jax import lax

    kh, kw = _kernel_shape(kernel)
    window = (kh, kw) + (1,) * (image.ndim - 2)
    strides = (1,) * image.ndim
    init = jnp.array(jnp.iinfo(image.dtype).min if jnp.issubdtype(image.dtype, jnp.integer) else -jnp.inf, image.dtype)
    return lax.reduce_window(image, init, lax.max, window, strides, "SAME")


def erode_jax(image, kernel=(3, 3)):
    import jax.numpy as jnp
    from jax import lax

    kh, kw = _kernel_shape(kernel)
    window = (kh, kw) + (1,) * (image.ndim - 2)
    strides = (1,) * image.ndim
    init = jnp.array(jnp.iinfo(image.dtype).max if jnp.issubdtype(image.dtype, jnp.integer) else jnp.inf, image.dtype)
    return lax.reduce_window(image, init, lax.min, window, strides, "SAME")
