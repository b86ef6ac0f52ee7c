"""Batched on-device binary morphology for the segmentation stage.

The reference runs ``get_text_contours``' char_height-sized
close/open/dilate chain through cv2 on the host
(reference pc_segmentation.py:70-116); round 3 measured that chain at
~132 ms/page on this 1-core host — the dominant cost of the
text-contours mode.  This module moves the whole chain into ONE jitted
XLA program per (batch, page shape, kernel triple), batched over pages,
with 1-bit-packed masks on the link (~1.1 MB per A4 page each way).

TPU-first design: rectangular binary morphology is NOT expressed as
``lax.reduce_window`` (O(k) per pixel at char_height-sized kernels) but
as separable sparse-table OR/AND filters: per axis, O(log2 k) doubling
shift-combines of the boolean array plus one overlap combine cover any
window size, each step a contiguous slice pair.  Two earlier
formulations are documented failures on the tunneled chip: traced
kernel sizes entering through ``take_along_axis`` indices reliably
CRASHED the TPU worker ("kernel fault") at 300-DPI A4 shapes, and an
integral-image (double-cumsum) variant both overflowed the
remote-compile transport with (H, W) count constants and ran ~10x
slower than the shift form (XLA lowers a cumsum to a log-step scan of
int32 traffic; the shift form moves 1-byte bools with no scan).  Kernel
extents are static per program; pages with mixed char_heights still
share one program via an elementwise select (see
``TextRegionMorphDevice``).  Padding reproduces cv2's border
conventions exactly (dilate: constant border that never adds
foreground; erode: border cells count as foreground), verified for odd
AND even kernels against cv2 in tests/test_device_morph.py.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def morph_kernels(char_height: int) -> Tuple[int, int, int]:
    """The three kernel sizes of the text-contours chain, computed on the
    HOST with reference-exact Python semantics (int() truncation of a
    float division — reference pc_segmentation.py:82-95)."""
    return (
        max(int(char_height), 1),
        max(int(char_height / 3), 1),
        max(int(char_height / 1.1), 1),
    )


def _sliding(mask, k: int, anchor: int, axis: int, op, pad_const: bool):
    """1-D sliding-window combine along ``axis`` with static window ``k``:
    out[y] = op-reduction of mask[y-anchor : y-anchor+k], out-of-bounds
    cells reading ``pad_const``.  Sparse-table doubling: O(log2 k)
    shift-combines of the boolean array, each a contiguous slice pair —
    no gather, no scan."""
    from jax import lax

    import jax.numpy as jnp

    length = mask.shape[axis]
    cfg = [(0, 0)] * mask.ndim
    cfg[axis] = (anchor, k - 1 - anchor)
    table = jnp.pad(mask, cfg, constant_values=pad_const)
    width = 1
    while width * 2 <= k:
        span = table.shape[axis] - width
        table = op(lax.slice_in_dim(table, 0, span, axis=axis),
                   lax.slice_in_dim(table, width, width + span, axis=axis))
        width *= 2
    if width == k:
        return lax.slice_in_dim(table, 0, length, axis=axis)
    # two overlapping power-of-two windows cover any k
    return op(lax.slice_in_dim(table, 0, length, axis=axis),
              lax.slice_in_dim(table, k - width, k - width + length,
                               axis=axis))


def dilate_box(mask_bool, kh: int, kw: int):
    """cv2.dilate-exact batched dilation; (N, H, W) bool, static kernel.
    Separable OR filter; out-of-bounds contributes no foreground (cv2's
    dilate border convention)."""
    import jax.numpy as jnp

    m = _sliding(mask_bool, kh, kh // 2, 1, jnp.logical_or, False)
    return _sliding(m, kw, kw // 2, 2, jnp.logical_or, False)


def erode_box(mask_bool, kh: int, kw: int):
    """cv2.erode-exact batched erosion; out-of-bounds counts as
    foreground (cv2's erode border convention)."""
    import jax.numpy as jnp

    m = _sliding(mask_bool, kh, kh // 2, 1, jnp.logical_and, True)
    return _sliding(m, kw, kw // 2, 2, jnp.logical_and, True)


def text_region_chain(mask_bool, kernels: Tuple[int, int, int]):
    """The full text-contours morphology chain on device.

    mask_bool: (N, H, W) text-pixel mask; kernels: the static (k, k/3,
    k/1.1) triple from ``morph_kernels``.  Chain (reference
    pc_segmentation.py:82-95): close(k) -> open(k/3) -> dilate(k/1.1)
    -> close(k/1.1).
    """
    k, k3, k11 = (int(v) for v in kernels)
    m = erode_box(dilate_box(mask_bool, k, k), k, k)        # close(k)
    m = dilate_box(erode_box(m, k3, k3), k3, k3)            # open(k/3)
    m = dilate_box(m, k11, k11)                             # grow chars
    m = erode_box(dilate_box(m, k11, k11), k11, k11)        # close(k/1.1)
    return m


# byte -> 8 mask pixels (MSB first), 0/255: one gather unpacks a packed
# download in a single pass
_UNPACK_LUT = np.where(
    (np.arange(256)[:, None] >> np.arange(7, -1, -1)) & 1,
    np.uint8(255), np.uint8(0),
).astype(np.uint8)


class TextRegionMorphDevice:
    """Caches one jitted packed-in/packed-out program per
    (padded batch, H, W, distinct kernel triples).

    Pages with MIXED char_heights still share one upload, one program
    and one download: the program computes the chain once per *distinct*
    triple over the whole batch and selects each page's result with an
    elementwise ``where`` on a per-page assignment vector (data, not a
    compile key — so re-shuffling the same char_heights reuses the
    program).  A per-triple-dispatch design measured ~30-70 ms of link
    latency per tiny dispatch on the tunneled chip; corpora with one
    char_height (the production norm) compile a single-triple program
    with zero select overhead.  The batch dimension pads to the next
    power of two (zero pages, cropped after download) so ragged sizes
    reuse a handful of programs.
    """

    def __init__(self):
        self._programs = {}

    def _program(self, shape, triples: Tuple[Tuple[int, int, int], ...]):
        import jax

        key = (shape, triples)
        if key not in self._programs:
            from ..inference.output import unpack_bits_device

            @jax.jit
            def run(packed, assign):
                import jax.numpy as jnp

                mask = unpack_bits_device(packed)
                region = text_region_chain(mask, triples[0])
                for t, triple in enumerate(triples[1:], start=1):
                    # elementwise select, never a gather (see module
                    # docstring: gathers at A4 shapes crashed the worker)
                    region = jnp.where(
                        (assign == t)[:, None, None],
                        text_region_chain(mask, triple), region)
                # 1-bit repack for the download
                n, h, w = region.shape
                bits = region.reshape(n, h, w // 8, 8).astype(jnp.uint8)
                weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
                return (bits * weights).sum(axis=-1).astype(jnp.uint8)

            self._programs[key] = run
        return self._programs[key]

    def dispatch(self, masks: np.ndarray, kernels):
        """Pack + upload + enqueue the device chain; returns an opaque
        handle for :meth:`collect`.  ``kernels``: one (k, k3, k11) triple
        for the whole batch, or a per-page list of triples.  The dispatch
        is asynchronous, so the caller can overlap host work (contours/
        render of the previous batch) with the device round-trip."""
        import jax

        n, h, w = masks.shape
        if isinstance(kernels[0], (int, np.integer)):
            kernels = [tuple(int(k) for k in kernels)] * n
        else:
            kernels = [tuple(int(k) for k in t) for t in kernels]
        uniq = tuple(sorted(set(kernels)))
        w8 = -(-w // 8) * 8
        n_pad = 1 << max(0, n - 1).bit_length()
        if w8 != w or n_pad != n:
            padded = np.zeros((n_pad, h, w8), bool)
            padded[:n, :, :w] = masks
            masks = padded
        packed = np.packbits(masks, axis=-1)
        assign = np.zeros(n_pad, np.int32)
        assign[:n] = [uniq.index(t) for t in kernels]
        out = self._program((n_pad, h, w8), uniq)(
            jax.device_put(packed), jax.device_put(assign))
        return out, n, w

    def collect(self, handle) -> np.ndarray:
        """Blocking download + single-pass unpack to (N, H, W) uint8
        0/255.  One LUT gather instead of unpackbits + two astype copies
        (three 78 MB passes measured at ~650 ms/batch on this host)."""
        out, n, w = handle
        packed = np.asarray(out)
        n_pad, h, w8 = packed.shape
        unpacked = _UNPACK_LUT[packed].reshape(n_pad, h, w8 * 8)
        return unpacked[:n, :, :w]

    def run(self, masks: np.ndarray, kernels) -> np.ndarray:
        """dispatch + collect; returns uint8 0/255 region masks."""
        return self.collect(self.dispatch(masks, kernels))
