"""Output mask rendering — the bit-compatibility surface.

Parity with reference output.py: ``Masks`` (:12-17), ``output_data``
(:20-41), ``generate_output_masks`` (:44-60) — color / overlay /
inverted_overlay / fg_color_mask exactly as the reference computes them
(overlay keeps color where the binary is background; inverted_overlay and
fg_color_mask keep color on ink pixels) — and ``scale_to_original_shape``
(:63-79).

A fused device path (``masks_on_device``) computes argmax + palette gather +
all three masks on-TPU so only uint8 RGB leaves the chip.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, replace
from typing import Optional

import numpy as np

from ..core.colors import ColorMap
from ..core.image_io import imsave
from ..data.dataset import SingleData
from ..ops.resize import resize_nearest


@dataclass
class Masks:
    color: np.ndarray
    overlay: np.ndarray
    inverted_overlay: np.ndarray
    fg_color_mask: Optional[np.ndarray] = None


def generate_output_masks(data: SingleData, pred: np.ndarray, color_map: ColorMap) -> Masks:
    """The four mask products, keyed on the PREPARED binary's exact values
    (prepare_images inverts, so ink == 1 and paper == 0):

    * ``overlay``          drops pixels where binary == 1 (ink removed);
    * ``inverted_overlay`` drops pixels where binary == 0 (ink only);
    * ``fg_color_mask``    keeps pixels where binary == 1 only.

    For 0/1 binaries fg_color_mask == inverted_overlay; the ==1 / ==0
    distinction (not truthiness) is the reference contract for any other
    values (reference output.py:44-60 masks through ``1 - binary``).  The
    same ``where`` formulation runs on-device in :func:`masks_on_device`.
    """
    color = color_map.to_rgb_array(pred)
    binary = np.asarray(data.binary)
    is_ink = (binary == 1)[..., None]
    is_paper = (binary == 0)[..., None]
    return Masks(
        color=color,
        overlay=np.where(is_ink, np.uint8(0), color),
        inverted_overlay=np.where(is_paper, np.uint8(0), color),
        fg_color_mask=np.where(is_ink, color, np.uint8(0)),
    )


def output_data(output_dir, pred: np.ndarray, data: SingleData, color_map: ColorMap) -> None:
    if pred.ndim == 3:
        assert pred.shape[0] == 1
        pred = pred[0]

    if data.output_path:
        filename = data.output_path
        directory = os.path.dirname(filename)
        if os.path.isabs(directory):
            # deliberate divergence from the reference (output.py:27-33):
            # there, joining output_dir with an ABSOLUTE filename discards
            # the prefix, so all three masks collide on one path and two
            # are silently destroyed; here the trio lands in
            # color/overlay/inverted subdirs of the requested directory
            base = os.path.basename(filename)
            masks = generate_output_masks(data, pred, color_map)
            for category, mask in zip(
                ("color", "overlay", "inverted"),
                (masks.color, masks.overlay, masks.inverted_overlay),
            ):
                os.makedirs(os.path.join(directory, category), exist_ok=True)
                imsave(os.path.join(directory, category, base), mask)
            return
        if directory:
            for category in ("color", "overlay", "inverted"):
                os.makedirs(os.path.join(output_dir, category, directory), exist_ok=True)
    else:
        filename = os.path.basename(data.image_path)

    masks = generate_output_masks(data, pred, color_map)
    for category, mask in zip(
        ("color", "overlay", "inverted"),
        (masks.color, masks.overlay, masks.inverted_overlay),
    ):
        imsave(os.path.join(output_dir, category, filename), mask)


def scale_to_original_shape(data: SingleData, pred: np.ndarray):
    resized_image = resize_nearest(data.image, data.original_shape)
    pred = resize_nearest(pred, data.original_shape).astype("int64")
    if data.binary.shape != data.original_shape:
        if data.orig_binary is not None:
            resized_binary = data.orig_binary
        else:
            resized_binary = resize_nearest(data.binary, data.original_shape).astype(bool)
    else:
        resized_binary = data.binary
    return replace(data, binary=resized_binary, image=resized_image), pred


# ------------------------------------------------------------------- device
def masks_on_device(logits, binary, palette):
    """Fused on-TPU mask generation.

    logits: (H, W, C) or (N, H, W, C) float; binary: matching (.., H, W)
    uint8 with 1 = ink; palette: (n_classes, 3) uint8.
    Returns (pred, color, overlay, inverted) device arrays (uint8 except
    pred int32).  Semantics mirror generate_output_masks above.
    """
    import jax.numpy as jnp

    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    color = jnp.take(palette, jnp.clip(pred, 0, palette.shape[0] - 1), axis=0)
    ink = (binary != 0)[..., None]
    overlay = jnp.where(ink, jnp.uint8(0), color)
    inverted = jnp.where(ink, color, jnp.uint8(0))
    return pred, color, overlay, inverted


def pack_classes_device(pred):
    """Pack a (N, H, W) class map into 2 bits/pixel on device (device half
    of the link-disciplined download; valid while classes fit in 2 bits,
    W a multiple of 4).  Returns (N, H, W//4) uint8."""
    import jax.numpy as jnp

    n, h, w = pred.shape
    quads = pred.astype(jnp.uint8).reshape(n, h, w // 4, 4)
    packed = jnp.sum(
        quads.astype(jnp.uint32) << jnp.array([0, 2, 4, 6], jnp.uint32), axis=-1
    )
    return packed.astype(jnp.uint8)


def unpack_classes(packed: np.ndarray) -> np.ndarray:
    """Host inverse of :func:`pack_classes_device`: (N, H, W//4) uint8 ->
    (N, H, W) uint8 class map."""
    quads = (packed[..., None] >> np.uint8([0, 2, 4, 6])) & np.uint8(3)
    return quads.reshape(packed.shape[0], packed.shape[1], -1)


def pack_bits_host(mask: np.ndarray) -> np.ndarray:
    """Pack a (..., W) 0/1 mask into 1 bit/pixel for upload: (..., W//8)
    uint8, MSB-first (np.packbits convention).  Requires W % 8 == 0."""
    return np.packbits(np.asarray(mask, bool), axis=-1)


def unpack_bits_device(packed):
    """Device inverse of :func:`pack_bits_host`: (..., W//8) uint8 ->
    (..., W) bool, MSB-first."""
    import jax.numpy as jnp

    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # MSB first
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,)).astype(jnp.bool_)


def finish_mask_trio(pred: np.ndarray, ink: np.ndarray, palette: np.ndarray, out=None):
    """(color, overlay, inverted) for a batch of (padded) class maps and
    their ink masks — native C kernel when available, numpy fallback.
    ``pred`` may be wider/taller than ``ink``; the trio crops to ink.
    ``out``: optional preallocated (color, overlay, inverted) uint8
    buffers to write into (reused-buffer mode; see pipeline)."""
    from .. import native

    palette = np.ascontiguousarray(palette, np.uint8)
    ink_u8 = np.ascontiguousarray(ink, np.uint8)
    fused = native.finish_masks(pred, ink_u8, palette, out=out)
    if fused is not None:
        return fused
    h, w = ink.shape[1:]
    clipped = np.minimum(pred[:, :h, :w], len(palette) - 1)
    ink3 = ink_u8[..., None]
    if out is not None:
        # honor the reuse contract on the fallback too: gather and the
        # overlay/inverted products write straight into the caller's
        # buffers (no fresh 54 MB/batch temporaries)
        color, overlay, inverted = out
        np.take(palette, clipped, axis=0, out=color)
        np.multiply(color, 1 - ink3, out=overlay, casting="unsafe")
        np.multiply(color, ink3, out=inverted, casting="unsafe")
        return out
    color = palette[clipped]
    return color, color * (1 - ink3), color * ink3
