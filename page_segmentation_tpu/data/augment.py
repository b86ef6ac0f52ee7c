"""Seeded affine data augmentation.

Behavioral parity with the reference's Keras ImageDataGenerator triple
(reference network.py:109-125,149-157 + trainer.py:13-56): one random
affine (rotation / shift / shear / zoom / flips) is sampled per page and
applied identically to image (order 3), binary (order 0) and mask
(order 0), with 'nearest' fill — the reference achieves this by seeding
three generators with the same seed; here one explicit parameter draw is
shared, which is the same contract without the RNG gymnastics.

The transform composition and center-offset convention reproduce the Keras
affine semantics (rotation@shift@shear@zoom, offset about (dim/2 - 0.5)).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


@dataclass
class AffineParams:
    theta: float = 0.0  # degrees
    tx: float = 0.0  # pixels (rows)
    ty: float = 0.0  # pixels (cols)
    shear: float = 0.0  # degrees
    zx: float = 1.0
    zy: float = 1.0
    flip_horizontal: bool = False
    flip_vertical: bool = False
    brightness: Optional[float] = None


def sample_affine_params(
    rng: np.random.Generator,
    shape: Tuple[int, int],
    rotation_range: float = 0.0,
    width_shift_range: float = 0.0,
    height_shift_range: float = 0.0,
    shear_range: float = 0.0,
    zoom_range=(1.0, 1.0),
    horizontal_flip: bool = False,
    vertical_flip: bool = False,
    brightness_range=None,
) -> AffineParams:
    h, w = shape
    theta = float(rng.uniform(-rotation_range, rotation_range)) if rotation_range else 0.0
    tx = ty = 0.0
    if height_shift_range:
        tx = float(rng.uniform(-height_shift_range, height_shift_range))
        if height_shift_range < 1:
            tx *= h
    if width_shift_range:
        ty = float(rng.uniform(-width_shift_range, width_shift_range))
        if width_shift_range < 1:
            ty *= w
    shear = float(rng.uniform(-shear_range, shear_range)) if shear_range else 0.0
    if zoom_range[0] == 1 and zoom_range[1] == 1:
        zx = zy = 1.0
    else:
        zx, zy = (float(z) for z in rng.uniform(zoom_range[0], zoom_range[1], 2))
    flip_h = horizontal_flip and bool(rng.random() < 0.5)
    flip_v = vertical_flip and bool(rng.random() < 0.5)
    brightness = (
        float(rng.uniform(brightness_range[0], brightness_range[1])) if brightness_range else None
    )
    return AffineParams(theta, tx, ty, shear, zx, zy, flip_h, flip_v, brightness)


def _offset_center(matrix: np.ndarray, h: int, w: int) -> np.ndarray:
    o_x = float(h) / 2 - 0.5
    o_y = float(w) / 2 - 0.5
    offset = np.array([[1, 0, o_x], [0, 1, o_y], [0, 0, 1]])
    reset = np.array([[1, 0, -o_x], [0, 1, -o_y], [0, 0, 1]])
    return offset @ matrix @ reset


def affine_matrix(params: AffineParams, shape: Tuple[int, int]) -> np.ndarray:
    """3x3 homogeneous transform, Keras composition and axis convention.

    Keras builds the matrix in (x, y) coordinates and conjugates with the
    axis-permutation (M' = P M P) before handing it to scipy's (row, col)
    ``affine_transform`` — reproduced verbatim so parameters mean exactly
    what they mean in the reference's augmentation."""
    matrix = np.eye(3)
    if params.theta:
        t = np.deg2rad(params.theta)
        matrix = matrix @ np.array(
            [[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0], [0, 0, 1]]
        )
    if params.tx or params.ty:
        matrix = matrix @ np.array([[1, 0, params.tx], [0, 1, params.ty], [0, 0, 1]])
    if params.shear:
        s = np.deg2rad(params.shear)
        matrix = matrix @ np.array([[1, -np.sin(s), 0], [0, np.cos(s), 0], [0, 0, 1]])
    if params.zx != 1 or params.zy != 1:
        matrix = matrix @ np.array([[params.zx, 0, 0], [0, params.zy, 0], [0, 0, 1]])
    if not np.allclose(matrix, np.eye(3)):
        matrix = _offset_center(matrix, shape[0], shape[1])
        # PMP conjugation: (x, y) convention -> numpy (row, col)
        matrix = matrix.copy()
        matrix[:, [0, 1]] = matrix[:, [1, 0]]
        matrix[[0, 1]] = matrix[[1, 0]]
    return matrix


def apply_affine(
    image: np.ndarray,
    params: AffineParams,
    order: int,
    fill_mode: str = "nearest",
    cval: float = 0.0,
) -> np.ndarray:
    """Apply the transform to one (H, W) or (H, W, C) array."""
    from scipy import ndimage as ndi

    matrix = affine_matrix(params, image.shape[:2])
    out = image
    if not np.allclose(matrix, np.eye(3)):
        linear = matrix[:2, :2]
        offset = matrix[:2, 2]
        if out.ndim == 2:
            out = ndi.affine_transform(
                out, linear, offset=offset, order=order, mode=fill_mode, cval=cval
            )
        else:
            out = np.stack(
                [
                    ndi.affine_transform(
                        out[..., c], linear, offset=offset, order=order, mode=fill_mode, cval=cval
                    )
                    for c in range(out.shape[-1])
                ],
                axis=-1,
            )
    if params.flip_horizontal:
        out = out[:, ::-1]
    if params.flip_vertical:
        out = out[::-1]
    if params.brightness is not None:
        out = np.clip(out.astype(np.float64) * params.brightness, 0, 255).astype(image.dtype)
    return out


def augment_triple(
    image: np.ndarray,
    binary: Optional[np.ndarray],
    mask: np.ndarray,
    params: AffineParams,
    settings,
):
    """Apply one shared transform: image order-3, binary/mask order-0
    (reference trainer.py:45-56 per-stream interpolation orders)."""
    no_brightness = AffineParams(**{**params.__dict__, "brightness": None})
    image_out = apply_affine(
        image, params, order=3, fill_mode=settings.image_fill_mode, cval=settings.image_cval
    )
    binary_out = (
        apply_affine(
            binary, no_brightness, order=0, fill_mode=settings.binary_fill_mode, cval=settings.binary_cval
        )
        if binary is not None
        else None
    )
    mask_out = apply_affine(
        mask, no_brightness, order=0, fill_mode=settings.mask_fill_mode, cval=settings.mask_cval
    )
    return image_out, binary_out, mask_out
