"""Morphology primitives (dilate/erode/open/close).

The reference uses cv2 morphology (pc_segmentation.py:63-67 ``dilate`` 3x3;
:82-95 rectangular close/open/dilate sized by char_height).  Re-owned here:

* host path: cv2 when present (van Herk O(1)/pixel SIMD — the
  char_height-sized close/open in get_text_contours runs rectangular
  kernels of ~120 px on full-res pages, where it measured ~4x scipy),
  with a scipy.ndimage max/min-filter fallback using cv2-compatible
  border behavior (constant border that never introduces foreground);
  the two are equality-gated against each other and against live cv2
  (tests/test_cv2_parity_live.py, tests/test_ops.py).
* device path: jax ``lax.reduce_window`` max/min — fuses into the on-TPU
  postprocessing pipeline.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

try:  # optional fast path; the scipy fallback is the semantic contract
    import cv2 as _cv2
except ImportError:  # pragma: no cover - depends on host
    _cv2 = None

# morphology dtypes cv2 kernels accept (8U/16U/16S/32F/64F)
_CV2_DTYPES = (np.uint8, np.uint16, np.int16, np.float32, np.float64)


def _kernel_shape(kernel) -> Tuple[int, int]:
    if isinstance(kernel, np.ndarray):
        return kernel.shape[:2]
    kh, kw = kernel
    return int(kh), int(kw)


def _cv2_eligible(image: np.ndarray) -> bool:
    return (
        _cv2 is not None
        and image.ndim in (2, 3)
        and (image.ndim == 2 or image.shape[2] <= 4)
        and image.dtype in _CV2_DTYPES
    )


def dilate(image: np.ndarray, kernel=(3, 3), iterations: int = 1) -> np.ndarray:
    """Grayscale/binary dilation with a rectangular kernel (cv2.dilate).

    Works per channel on (H, W, C) inputs, like cv2 on color images.
    """
    kh, kw = _kernel_shape(kernel)
    out = np.asarray(image)
    if _cv2_eligible(out):
        res = _cv2.dilate(out, np.ones((kh, kw), np.uint8),
                          iterations=int(iterations))
        # cv2 squeezes single-channel (H, W, 1) inputs to (H, W)
        return res.reshape(out.shape) if res.ndim != out.ndim else res
    from scipy import ndimage as ndi

    size = (kh, kw) + (1,) * (out.ndim - 2)
    for _ in range(int(iterations)):
        out = ndi.maximum_filter(out, size=size, mode="constant", cval=np.iinfo(out.dtype).min if out.dtype.kind in "iu" else -np.inf)
    return out


def erode(image: np.ndarray, kernel=(3, 3), iterations: int = 1) -> np.ndarray:
    kh, kw = _kernel_shape(kernel)
    out = np.asarray(image)
    if _cv2_eligible(out):
        res = _cv2.erode(out, np.ones((kh, kw), np.uint8),
                         iterations=int(iterations))
        return res.reshape(out.shape) if res.ndim != out.ndim else res
    from scipy import ndimage as ndi

    size = (kh, kw) + (1,) * (out.ndim - 2)
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
