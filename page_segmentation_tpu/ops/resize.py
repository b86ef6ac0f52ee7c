"""Image resizing primitives.

The reference delegates resizing to skimage (reference dataset.py:114-128:
``rescale(order=0)`` for binaries, ``resize(order=3, anti_aliasing=
len(unique)>2)`` for images; util.py:21-29 ``preserving_resize`` order=0).
skimage does not exist in this environment, so we re-own the wrapper math
(cv2 does, and the cv2-convention paths are live-gated —
tests/test_cv2_parity_live.py):

* host path: numpy nearest + scipy.ndimage cubic-spline resize reproducing
  skimage's coordinate convention (center-aligned: src = (dst+0.5)*f-0.5,
  spline prefilter, mirror boundary, optional gaussian anti-aliasing with
  sigma=(f-1)/2) — the parity path for dataset preparation.  skimage>=0.19
  ``resize`` is itself a thin wrapper over ``ndi.zoom(order=3,
  mode='mirror', grid_mode=True)`` after the same gaussian prefilter, and
  scipy IS installed: ``resize_cubic`` is gated bit-exact against that
  call chain (tests/test_ops.py::test_resize_cubic_equals_ndi_zoom_grid_mode),
  so only the thin wrapper — not the interpolation — is re-derived.
* device path: jax nearest gather + jax.image cubic for fused on-TPU
  pipelines where static shapes are available.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


# --------------------------------------------------------------------- host
def output_shape_for_scale(shape: Sequence[int], scale: float) -> Tuple[int, ...]:
    """Output shape used by skimage.rescale: round(dim * scale)."""
    return tuple(int(np.round(d * scale)) for d in shape)


def resize_nearest(image: np.ndarray, out_shape: Sequence[int]) -> np.ndarray:
    """Order-0 resize preserving values (reference scale_binary / preserving_resize).

    Uses the center-aligned mapping src = (dst + 0.5) * in/out - 0.5 with
    round-half-up, clipped to bounds — matching scipy.ndimage order-0
    interpolation at those coordinates.
    """
    image = np.asarray(image)
    out_shape = tuple(int(s) for s in out_shape)
    if image.shape[: len(out_shape)] == out_shape:
        return image.copy()
    idx = []
    for out_dim, in_dim in zip(out_shape, image.shape):
        if out_dim == in_dim:
            idx.append(np.arange(in_dim))
            continue
        coords = (np.arange(out_dim) + 0.5) * (in_dim / out_dim) - 0.5
        idx.append(np.clip(np.floor(coords + 0.5).astype(np.int64), 0, in_dim - 1))
    if len(out_shape) == 2:
        return image[np.ix_(idx[0], idx[1])]
    grids = np.meshgrid(*idx, indexing="ij")
    return image[tuple(grids)]


def rescale_nearest(image: np.ndarray, scale: float) -> np.ndarray:
    return resize_nearest(image, output_shape_for_scale(image.shape[:2], scale))


def resize_nearest_cv(image: np.ndarray, out_shape: Sequence[int]) -> np.ndarray:
    """Nearest resize with OpenCV's pixel-selection rule (INTER_NEAREST).

    The reference's ``find_segments`` resizes the prediction to its
    canonical working height with ``cv2.resize(..., INTER_NEAREST)``
    (reference pc_segmentation.py:31), whose mapping differs from the
    skimage convention of :func:`resize_nearest`: per axis,

        ``src = min(floor(dst * (1.0 / (out / in))), in - 1)``

    where ``out / in`` and its reciprocal are both rounded to float64 —
    cv2 computes ``inv_scale = dsize/ssize`` first and divides 1 by it, so
    when ``dst * in/out`` is mathematically integral the double rounding
    can select the *previous* source pixel.  That double rounding is the
    behavioral contract: this formula was validated exact against real
    cv2 5.0 on 1200 randomized gray+RGB cases (see
    tests/test_cv2_parity_live.py) and is frozen in tests/oracles/.
    """
    image = np.asarray(image)
    out_shape = tuple(int(s) for s in out_shape)
    idx = []
    for out_dim, in_dim in zip(out_shape, image.shape):
        inv = np.float64(1.0) / np.float64(out_dim / in_dim)
        coords = np.floor(np.arange(out_dim, dtype=np.float64) * inv)
        idx.append(np.minimum(coords.astype(np.int64), in_dim - 1))
    return image[np.ix_(idx[0], idx[1])]


def resize_cubic(
    image: np.ndarray,
    out_shape: Sequence[int],
    anti_aliasing: bool = False,
    preserve_range: bool = True,
) -> np.ndarray:
    """Order-3 spline resize matching skimage.transform.resize semantics
    (reference dataset.py:122-128)."""
    from scipy import ndimage as ndi

    image = np.asarray(image, dtype=np.float64)
    out_shape = tuple(int(s) for s in out_shape)
    in_shape = image.shape[: len(out_shape)]
    if in_shape == out_shape:
        return image.copy()

    factors = np.array(in_shape, dtype=np.float64) / np.array(out_shape, dtype=np.float64)
    if anti_aliasing:
        sigma = np.maximum(0.0, (factors - 1.0) / 2.0)
        if np.any(sigma > 0):
            image = ndi.gaussian_filter(image, sigma, mode="mirror")

    coords = np.meshgrid(
        *[
            (np.arange(out_dim) + 0.5) * (in_dim / out_dim) - 0.5
            for out_dim, in_dim in zip(out_shape, in_shape)
        ],
        indexing="ij",
    )
    return ndi.map_coordinates(image, np.stack(coords), order=3, mode="mirror")


def resize_cubic_fast(image: np.ndarray, out_shape: Sequence[int]) -> np.ndarray:
    """PIL bicubic resize — the fast host path for throughput prediction.

    Not bit-identical to the spline path but visually equivalent; predict
    exposes a ``resize_backend`` switch (parity: scipy, speed: pil).
    """
    from PIL import Image

    out_shape = tuple(int(s) for s in out_shape)
    arr = np.asarray(image)
    pil = Image.fromarray(arr.astype(np.float32) if arr.dtype != np.uint8 else arr)
    resized = pil.resize((out_shape[1], out_shape[0]), Image.BICUBIC)
    return np.asarray(resized, dtype=np.float64)


# ------------------------------------------------------------------- device
def resize_nearest_jax(image, out_shape: Sequence[int]):
    """Order-0 resize on device via gather; same mapping as resize_nearest."""
    import jax.numpy as jnp

    out_shape = tuple(int(s) for s in out_shape)
    idx = []
    for out_dim, in_dim in zip(out_shape, image.shape):
        coords = (jnp.arange(out_dim) + 0.5) * (in_dim / out_dim) - 0.5
        idx.append(jnp.clip(jnp.floor(coords + 0.5).astype(jnp.int32), 0, in_dim - 1))
    rows = idx[0][:, None]
    cols = idx[1][None, :]
    return image[rows, cols]


def resize_cubic_jax(image, out_shape: Sequence[int]):
    """Cubic resize on device (Keys kernel via jax.image)."""
    import jax.image

    out_shape = tuple(int(s) for s in out_shape) + tuple(image.shape[2:])
    return jax.image.resize(image, out_shape, method="cubic")
