"""ctypes bindings for the native host kernels (ps_native.cpp).

Auto-builds ``libps_native.so`` with the in-tree Makefile on first import
when a toolchain is present; all callers keep a pure scipy/numpy fallback,
so the framework works without a compiler too.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libps_native.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"], check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_LIB_PATH)
    except Exception as exc:  # no toolchain / build failure -> fallback
        logger.debug(f"native build unavailable: {exc}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as exc:
        logger.debug(f"native load failed: {exc}")
        return None

    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

    lib.ps_cc_with_stats.restype = ctypes.c_int
    lib.ps_cc_with_stats.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, i32p, f64p, ctypes.c_int,
    ]
    lib.ps_cc_vote.restype = ctypes.c_int
    lib.ps_cc_vote.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p]
    lib.ps_contours.restype = ctypes.c_int
    lib.ps_contours.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int, i32p, ctypes.c_int,
    ]
    lib.ps_decimate_u8.restype = None
    lib.ps_decimate_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
    ]
    lib.ps_gather_ink.restype = None
    lib.ps_gather_ink.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        i32p, ctypes.c_int, i32p, ctypes.c_int, u8p,
    ]
    lib.ps_finish.restype = None
    lib.ps_finish.argtypes = [
        u8p, u8p, u8p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, u8p, u8p,
    ]
    if hasattr(lib, "ps_finish_packed"):  # stale .so without the symbol
        lib.ps_finish_packed.restype = None
        lib.ps_finish_packed.argtypes = list(lib.ps_finish.argtypes)
    if hasattr(lib, "ps_vote_finish_packed"):
        lib.ps_vote_finish_packed.restype = None
        lib.ps_vote_finish_packed.argtypes = [
            u8p, u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, u8p, u8p,
        ]
    if hasattr(lib, "ps_bitmorph"):  # stale .so without the symbol
        lib.ps_bitmorph.restype = ctypes.c_int
        lib.ps_bitmorph.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
        ]
        lib.ps_bitmorph_chain.restype = ctypes.c_int
        lib.ps_bitmorph_chain.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
        ]
    if hasattr(lib, "ps_png_unfilter"):  # stale .so without the symbol
        lib.ps_png_unfilter.restype = ctypes.c_int
        lib.ps_png_unfilter.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
        ]
    if hasattr(lib, "ps_pack_indices"):  # stale .so without the symbol
        lib.ps_pack_indices.restype = ctypes.c_int
        lib.ps_pack_indices.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
        ]
        lib.ps_unpack_indices.restype = ctypes.c_int
        lib.ps_unpack_indices.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
        ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


# ------------------------------------------------------------------ wrappers
def cc_with_stats(image: np.ndarray, connectivity: int = 4):
    """Native connectedComponentsWithStats; None if the library is absent."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray((np.asarray(image) != 0).astype(np.uint8))
    h, w = img.shape
    labels = np.empty((h, w), np.int32)
    max_labels = h * w // 2 + 2
    stats = np.empty((max_labels, 5), np.int32)
    centroids = np.empty((max_labels, 2), np.float64)
    n = lib.ps_cc_with_stats(img, h, w, connectivity, labels, stats, centroids, max_labels)
    if n < 0:
        return None
    return n, labels, stats[:n].copy(), centroids[:n].copy()


def cc_vote(binary: np.ndarray, pred: np.ndarray, n_classes: int) -> Optional[np.ndarray]:
    """Fused components+majority vote; returns the voted pred or None."""
    lib = get_lib()
    if lib is None:
        return None
    binary_u8 = np.ascontiguousarray((np.asarray(binary) != 0).astype(np.uint8))
    out = np.ascontiguousarray(np.asarray(pred), dtype=np.int32).copy()
    h, w = binary_u8.shape
    lib.ps_cc_vote(binary_u8, h, w, int(n_classes), out)
    return out


def bitmorph(mask: np.ndarray, k: int, erode: bool = False) -> Optional[np.ndarray]:
    """Single k x k dilate/erode on a binary mask via the bit-packed
    sliding-window kernel; returns uint8 0/255 or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ps_bitmorph"):
        return None
    m = np.ascontiguousarray(np.asarray(mask), np.uint8)
    h, w = m.shape
    out = np.empty((h, w), np.uint8)
    if lib.ps_bitmorph(m, h, w, int(k), int(bool(erode)), out) != 0:
        return None
    return out


def bitmorph_chain(mask: np.ndarray, k: int, k3: int, k11: int) -> Optional[np.ndarray]:
    """The text-contours morphology chain close(k)/open(k3)/dilate(k11)/
    close(k11) on a binary mask (bit-packed sliding windows, ~1/64th the
    byte traffic of the cv2 van Herk path); uint8 0/255 or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ps_bitmorph_chain"):
        return None
    m = np.ascontiguousarray(np.asarray(mask), np.uint8)
    h, w = m.shape
    out = np.empty((h, w), np.uint8)
    if lib.ps_bitmorph_chain(m, h, w, int(k), int(k3), int(k11), out) != 0:
        return None
    return out


def png_unfilter(rows: np.ndarray, bpp: int = 1) -> Optional[np.ndarray]:
    """Reconstruct PNG-filtered rows (RFC 2083 §6: none/sub/up/avg/paeth).

    ``rows`` is the inflated IDAT stream reshaped (h, stride+1) — filter
    byte + stride data bytes per row; returns the (h, stride) pixel bytes,
    or None (no native lib / invalid filter byte — general decoders take
    over).  ``bpp=1`` covers grayscale-8 and every sub-byte depth."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ps_png_unfilter"):
        return None
    r = np.ascontiguousarray(np.asarray(rows), np.uint8)
    h, stride_p1 = r.shape
    out = np.empty((h, stride_p1 - 1), np.uint8)
    if lib.ps_png_unfilter(r, h, stride_p1 - 1, int(bpp), out) != 0:
        return None
    return out


def pack_indices(labels: np.ndarray, depth: int) -> Optional[np.ndarray]:
    """MSB-first sub-byte packing of a (H, W) uint8 label map into
    (H, ceil(W*depth/8)) PNG index rows; None without the native lib."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ps_pack_indices"):
        return None
    m = np.ascontiguousarray(np.asarray(labels), np.uint8)
    h, w = m.shape
    k = 8 // depth
    out = np.empty((h, (w + k - 1) // k), np.uint8)
    if lib.ps_pack_indices(m, h, w, int(depth), out) != 0:
        return None
    return out


def unpack_indices(packed: np.ndarray, w: int, depth: int) -> Optional[np.ndarray]:
    """Inverse of pack_indices: (H, stride) rows -> (H, w) uint8 labels."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ps_unpack_indices"):
        return None
    m = np.ascontiguousarray(np.asarray(packed), np.uint8)
    h, stride = m.shape
    out = np.empty((h, w), np.uint8)
    if lib.ps_unpack_indices(m, h, stride, int(w), int(depth), out) != 0:
        return None
    return out


def contours(image: np.ndarray) -> Optional[List[np.ndarray]]:
    """External contours as (N, 2) int32 (x, y) arrays, or None."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray((np.asarray(image) != 0).astype(np.uint8))
    h, w = img.shape
    max_points = h * w + 16
    max_contours = h * w // 4 + 16
    points = np.empty((max_points, 2), np.int32)
    lens = np.empty(max_contours, np.int32)
    n = lib.ps_contours(img, h, w, points, max_points, lens, max_contours)
    if n < 0:
        return None
    out = []
    cursor = 0
    for i in range(n):
        out.append(points[cursor : cursor + lens[i]].copy())
        cursor += lens[i]
    return out


def decimate_u8(pages: np.ndarray, factor: int) -> Optional[np.ndarray]:
    """Batch box-mean decimation of (N, H, W) uint8 pages; None if the
    library is absent."""
    lib = get_lib()
    if lib is None:
        return None
    pages = np.ascontiguousarray(pages, np.uint8)
    n, h, w = pages.shape
    out = np.empty((n, h // factor, w // factor), np.uint8)
    lib.ps_decimate_u8(pages, n, h, w, int(factor), out)
    return out


def gather_ink(binaries: np.ndarray, row_idx: np.ndarray, col_idx: np.ndarray) -> Optional[np.ndarray]:
    """Ink mask (binary < 128) nearest-gathered to the normalized scale."""
    lib = get_lib()
    if lib is None:
        return None
    binaries = np.ascontiguousarray(binaries, np.uint8)
    row_idx = np.ascontiguousarray(row_idx, np.int32)
    col_idx = np.ascontiguousarray(col_idx, np.int32)
    n, h, w = binaries.shape
    out = np.empty((n, len(row_idx), len(col_idx)), np.uint8)
    lib.ps_gather_ink(binaries, n, h, w, row_idx, len(row_idx), col_idx, len(col_idx), out)
    return out


def _finish_out(n: int, oh: int, ow: int, out):
    """Allocate the trio, or validate caller-supplied reusable buffers
    (a fresh 54 MB/batch allocation costs ~120 ms of page faults on a
    1-core host; pools amortize it)."""
    if out is None:
        color = np.empty((n, oh, ow, 3), np.uint8)
        return color, np.empty_like(color), np.empty_like(color)
    color, overlay, inverted = out
    expected = (n, oh, ow, 3)
    for arr in (color, overlay, inverted):
        if arr.shape != expected or arr.dtype != np.uint8 or not arr.flags.c_contiguous:
            raise ValueError(f"out buffers must be C-contiguous uint8 {expected}")
    return color, overlay, inverted


def finish_masks(pred: np.ndarray, ink: np.ndarray, palette: np.ndarray, out=None):
    """Fused color/overlay/inverted reconstruction from a (padded) class map
    and the ink mask; None if the library is absent."""
    lib = get_lib()
    if lib is None:
        return None
    pred = np.ascontiguousarray(pred, np.uint8)
    ink = np.ascontiguousarray(ink, np.uint8)
    palette = np.ascontiguousarray(palette, np.uint8)
    n, ph, pw = pred.shape
    oh, ow = ink.shape[1:]
    if ph < oh or pw < ow:
        raise ValueError(f"pred {(ph, pw)} smaller than ink page {(oh, ow)}")
    if ink.shape[0] < n:
        raise ValueError(f"ink has {ink.shape[0]} pages < pred {n}")
    color, overlay, inverted = _finish_out(n, oh, ow, out)
    lib.ps_finish(pred, ink, palette, palette.shape[0], n, ph, pw, oh, ow,
                  color, overlay, inverted)
    return color, overlay, inverted


def vote_finish_packed(packed: np.ndarray, ink: np.ndarray, palette: np.ndarray,
                       n_classes: int, out=None):
    """The whole cc-vote finish stage in one GIL-free call: unpack the
    2-bit packed class download, majority-vote each 4-connected ink
    component (reference postprocess.py:9-26 semantics), render the trio.
    None if the library or symbol is absent (callers fall back to the
    unpack -> cc_vote -> finish_mask_trio chain)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ps_vote_finish_packed"):
        return None
    packed = np.ascontiguousarray(packed, np.uint8)
    ink = np.ascontiguousarray(ink, np.uint8)
    palette = np.ascontiguousarray(palette, np.uint8)
    n, ph, pw = packed.shape
    oh, ow = ink.shape[1:]
    if pw * 4 < ow:
        raise ValueError(f"packed width {pw} covers {pw * 4} pixels < ow {ow}")
    # the C kernel reads oh rows per page and n pages of ink: bound-check
    # here so a mismatched caller gets a ValueError, not a heap OOB read
    if ph < oh:
        raise ValueError(f"packed height {ph} < ink height {oh}")
    if ink.shape[0] < n:
        raise ValueError(f"ink has {ink.shape[0]} pages < packed {n}")
    color, overlay, inverted = _finish_out(n, oh, ow, out)
    lib.ps_vote_finish_packed(packed, ink, palette, palette.shape[0],
                              int(n_classes), n, ph, pw, oh, ow,
                              color, overlay, inverted)
    return color, overlay, inverted


def finish_masks_packed(packed: np.ndarray, ink: np.ndarray, palette: np.ndarray, out=None):
    """finish_masks reading the 2-bit packed class-map download directly
    (4 pixels/byte, LSB-first — output.unpack_classes layout), skipping
    the numpy unpack pass; None if the library or symbol is absent."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ps_finish_packed"):
        return None
    packed = np.ascontiguousarray(packed, np.uint8)
    ink = np.ascontiguousarray(ink, np.uint8)
    palette = np.ascontiguousarray(palette, np.uint8)
    n, ph, pw = packed.shape
    oh, ow = ink.shape[1:]
    if pw * 4 < ow:
        raise ValueError(f"packed width {pw} covers {pw * 4} pixels < ow {ow}")
    if ph < oh:
        raise ValueError(f"packed height {ph} < ink height {oh}")
    if ink.shape[0] < n:
        raise ValueError(f"ink has {ink.shape[0]} pages < packed {n}")
    color, overlay, inverted = _finish_out(n, oh, ow, out)
    lib.ps_finish_packed(packed, ink, palette, palette.shape[0], n, ph, pw, oh, ow,
                         color, overlay, inverted)
    return color, overlay, inverted
