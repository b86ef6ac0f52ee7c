"""On-device batched affine augmentation (opt-in performance mode).

The host path (data/augment.py) is pixel-exact with Keras and remains the
parity default.  This module moves the whole augmentation into the jitted
step: one fused bilinear/nearest warp per batch, parameters drawn from the
jax PRNG — on a single-core host the order-3 scipy warp caps training at
~100-200 pages/s, while the device warp is effectively free next to the
conv step.

Same parameter semantics as the Keras pipeline (rotation/shift/zoom/shear
ranges, shared transform across image/binary/mask, 'nearest' fill); only
the image interpolation differs (bilinear instead of cubic spline), which
is irrelevant for random augmentation.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class DeviceAugmentConfig(NamedTuple):
    rotation_range: float = 2.5  # degrees
    width_shift_range: float = 0.025
    height_shift_range: float = 0.025
    shear_range: float = 0.0
    zoom_min: float = 0.95
    zoom_max: float = 1.05
    horizontal_flip: bool = False
    vertical_flip: bool = False


def _sample_matrices(key, n: int, h: int, w: int, cfg: DeviceAugmentConfig):
    """(n, 2, 3) inverse affine maps in (row, col) coords, Keras convention
    (matrix maps output coords to input coords, centered)."""
    keys = jax.random.split(key, 6)
    theta = jnp.deg2rad(
        jax.random.uniform(keys[0], (n,), minval=-cfg.rotation_range, maxval=cfg.rotation_range)
    )
    tx = jax.random.uniform(
        keys[1], (n,), minval=-cfg.height_shift_range, maxval=cfg.height_shift_range
    ) * (h if cfg.height_shift_range < 1 else 1.0)
    ty = jax.random.uniform(
        keys[2], (n,), minval=-cfg.width_shift_range, maxval=cfg.width_shift_range
    ) * (w if cfg.width_shift_range < 1 else 1.0)
    shear = jnp.deg2rad(
        jax.random.uniform(keys[3], (n,), minval=-cfg.shear_range, maxval=cfg.shear_range)
    )
    zx = jax.random.uniform(keys[4], (n,), minval=cfg.zoom_min, maxval=cfg.zoom_max)
    zy = jax.random.uniform(keys[5], (n,), minval=cfg.zoom_min, maxval=cfg.zoom_max)

    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    # rotation @ shift @ shear @ zoom (Keras composition, (x, y) convention)
    # rows of the affine 2x3 in (x, y):
    a00 = cos_t * zx
    a01 = (-cos_t * jnp.sin(shear) - sin_t * jnp.cos(shear)) * zy
    a02 = cos_t * tx - sin_t * ty
    a10 = sin_t * zx
    a11 = (-sin_t * jnp.sin(shear) + cos_t * jnp.cos(shear)) * zy
    a12 = sin_t * tx + cos_t * ty

    # offset about the center, then PMP-swap into (row, col)
    o_x = h / 2.0 - 0.5
    o_y = w / 2.0 - 0.5
    b0 = a02 + o_x - (a00 * o_x + a01 * o_y)
    b1 = a12 + o_y - (a10 * o_x + a11 * o_y)
    # swapped: row' = a11*row + a10*col + b1 ; col' = a01*row + a00*col + b0
    mats = jnp.stack(
        [
            jnp.stack([a11, a10, b1], axis=-1),
            jnp.stack([a01, a00, b0], axis=-1),
        ],
        axis=1,
    )
    return mats


def _warp(img, mat, order: int, h: int, w: int):
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    src_r = mat[0, 0] * rows + mat[0, 1] * cols + mat[0, 2]
    src_c = mat[1, 0] * rows + mat[1, 1] * cols + mat[1, 2]
    # 'nearest' fill: clamp coordinates to the valid range
    src_r = jnp.clip(src_r, 0.0, h - 1.0)
    src_c = jnp.clip(src_c, 0.0, w - 1.0)
    if order == 0:
        r0 = jnp.round(src_r).astype(jnp.int32)
        c0 = jnp.round(src_c).astype(jnp.int32)
        return img[r0, c0]
    r0 = jnp.floor(src_r).astype(jnp.int32)
    c0 = jnp.floor(src_c).astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, h - 1)
    c1 = jnp.minimum(c0 + 1, w - 1)
    fr = src_r - r0
    fc = src_c - c0
    img_f = img.astype(jnp.float32)
    top = img_f[r0, c0] * (1 - fc) + img_f[r0, c1] * fc
    bottom = img_f[r1, c0] * (1 - fc) + img_f[r1, c1] * fc
    return top * (1 - fr) + bottom * fr


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch_on_device(key, images, binaries, masks, cfg: DeviceAugmentConfig):
    """Apply one shared random affine per page across the triple.

    images (N, H, W, C) float32, binaries (N, H, W) uint8,
    masks (N, H, W) int32.  Image warps bilinear; binary/mask nearest.
    """
    n, h, w = images.shape[:3]
    key_mat, key_flip_h, key_flip_v = jax.random.split(key, 3)
    mats = _sample_matrices(key_mat, n, h, w, cfg)

    def one(img, binary, mask, mat, flip_h, flip_v):
        img_out = jnp.stack(
            [_warp(img[..., c], mat, 1, h, w) for c in range(img.shape[-1])], axis=-1
        )
        bin_out = _warp(binary, mat, 0, h, w)
        mask_out = _warp(mask, mat, 0, h, w)
        if cfg.horizontal_flip:
            img_out = jnp.where(flip_h, img_out[:, ::-1], img_out)
            bin_out = jnp.where(flip_h, bin_out[:, ::-1], bin_out)
            mask_out = jnp.where(flip_h, mask_out[:, ::-1], mask_out)
        if cfg.vertical_flip:
            img_out = jnp.where(flip_v, img_out[::-1], img_out)
            bin_out = jnp.where(flip_v, bin_out[::-1], bin_out)
            mask_out = jnp.where(flip_v, mask_out[::-1], mask_out)
        return img_out, bin_out, mask_out

    flips_h = jax.random.bernoulli(key_flip_h, 0.5, (n,))
    flips_v = jax.random.bernoulli(key_flip_v, 0.5, (n,))
    return jax.vmap(one)(images, binaries, masks, mats, flips_h, flips_v)
