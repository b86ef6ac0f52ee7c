"""Contour extraction (border following).

Re-owned replacement for cv2.findContours as used by the reference's
morphological text segmentation (pc_segmentation.py:101,112): external
contours of binary regions as (x, y) point arrays, in raster discovery
order.  Moore-neighbor tracing over scipy-labeled components; compressed
to polyline vertices (CHAIN_APPROX_SIMPLE-style: collinear runs collapse).
"""
from __future__ import annotations

from typing import List

import numpy as np

# Moore neighborhood in clockwise order starting from west, as (dy, dx)
_NEIGHBORS = [(0, -1), (-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1)]


def _trace_boundary(mask: np.ndarray, start: tuple) -> List[tuple]:
    """Moore-neighbor boundary trace of the component containing ``start``
    (topmost-leftmost foreground pixel).  Returns [(y, x), ...].

    Terminates on Jacob's criterion — the walk is about to repeat its
    very first move (start pixel exited in the same direction) — not on
    mere re-entry of the start pixel, which truncates contours whenever
    the boundary legitimately passes through the start more than once
    (e.g. two lobes joined at the topmost pixel).
    """
    h, w = mask.shape

    def next_from(current, backtrack):
        # clockwise scan starting just after the backtrack direction
        for k in range(8):
            d = (backtrack + 1 + k) % 8
            dy, dx = _NEIGHBORS[d]
            ny, nx = current[0] + dy, current[1] + dx
            if 0 <= ny < h and 0 <= nx < w and mask[ny, nx]:
                return (ny, nx), d
        return None, None

    # west of start is background (row-major scan found start first)
    second, first_dir = next_from(start, 0)
    if second is None:  # isolated pixel
        return [start]

    boundary = [start]
    current, backtrack = second, (first_dir + 4) % 8
    for _ in range(4 * mask.size):
        boundary.append(current)
        nxt, d = next_from(current, backtrack)
        if nxt == start:
            after, after_dir = next_from(start, (d + 4) % 8)
            if (after, after_dir) == (second, first_dir):
                return boundary  # closed: the initial move would repeat
        current, backtrack = nxt, (d + 4) % 8
    return boundary


def _simplify(points: List[tuple]) -> np.ndarray:
    """Collapse collinear runs (horizontal/vertical/diagonal) to endpoints."""
    if len(points) <= 2:
        return np.array(points, dtype=np.int32)
    out = [points[0]]
    for i in range(1, len(points) - 1):
        dy0 = points[i][0] - out[-1][0]
        dx0 = points[i][1] - out[-1][1]
        dy1 = points[i + 1][0] - points[i][0]
        dx1 = points[i + 1][1] - points[i][1]
        # keep the point unless direction is unchanged
        norm0 = max(abs(dy0), abs(dx0)) or 1
        norm1 = max(abs(dy1), abs(dx1)) or 1
        if (dy0 * norm1, dx0 * norm1) != (dy1 * norm0, dx1 * norm0):
            out.append(points[i])
    out.append(points[-1])
    return np.array(out, dtype=np.int32)


def find_external_contours(binary: np.ndarray) -> List[np.ndarray]:
    """External contours of each connected component (8-connectivity).

    Returns a list of (N, 2) int32 arrays of (x, y) points — the cv2
    point convention — in raster discovery order of the components.

    Uses the native C++ tracer (native/ps_native.cpp) when built; this
    Python Moore tracer is the fallback.
    """
    from .. import native

    native_result = native.contours(binary)
    if native_result is not None:
        return native_result

    from scipy import ndimage as ndi

    mask = np.asarray(binary) != 0
    labels, num = ndi.label(mask, structure=np.ones((3, 3), bool))
    if num == 0:
        return []
    objects = ndi.find_objects(labels)
    contours = []
    # scipy labels are raster-ordered, so iteration order == discovery order
    for i, slc in enumerate(objects, start=1):
        if slc is None:
            continue
        component = labels[slc] == i
        ys, xs = np.nonzero(component)
        first = np.argmin(ys * component.shape[1] + xs)
        start = (int(ys[first]), int(xs[first]))
        traced = _trace_boundary(component, start)
        pts = _simplify(traced)
        # back to full-image coordinates, as (x, y)
        xy = np.stack([pts[:, 1] + slc[1].start, pts[:, 0] + slc[0].start], axis=1)
        contours.append(xy.astype(np.int32))
    return contours


try:  # optional fast path; the PIL rasterizer is the semantic contract
    import cv2 as _cv2
except ImportError:  # pragma: no cover - depends on host
    _cv2 = None


def fill_contour(canvas: np.ndarray, contour: np.ndarray, value) -> None:
    """Fill the polygon given by (x, y) points into ``canvas`` in place
    (cv2.drawContours(..., FILLED) equivalent via PIL rasterization;
    pixel-equal cv2 fast path when it is importable — gated by
    tests/test_cv2_parity_live.py on boundary-traced polygons, the only
    family callers pass)."""
    if contour.ndim != 2 or contour.shape[0] < 3:
        if contour.ndim == 2:
            for x, y in contour:
                canvas[int(y), int(x)] = value
        return
    if (
        _cv2 is not None
        and canvas.dtype == np.uint8
        and canvas.ndim in (2, 3)
        and canvas.flags.c_contiguous
    ):
        color = (
            tuple(int(v) for v in np.ravel(value))
            if np.ndim(value) or isinstance(value, (tuple, list))
            else int(value)
        )
        _cv2.drawContours(
            canvas, [contour.astype(np.int32).reshape(-1, 1, 2)], 0, color,
            _cv2.FILLED,
        )
        return
    from PIL import Image, ImageDraw

    mask = Image.new("1", (canvas.shape[1], canvas.shape[0]), 0)
    ImageDraw.Draw(mask).polygon([(int(x), int(y)) for x, y in contour], outline=1, fill=1)
    canvas[np.asarray(mask, bool)] = value
