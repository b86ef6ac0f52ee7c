"""Connected components with stats.

The reference leans on cv2.connectedComponentsWithStats
(postprocess.py:10,33; image_ops.py:68; evaluation.py:83).  cv2 is absent, so
we re-own the op with the same output contract:

* ``labels``: int32 label image, 0 = background, components numbered 1..n-1
  in row-major first-touch order.
* ``stats``: (n, 5) int32 rows ``[left, top, width, height, area]`` with row 0
  describing the background.
* ``centroids``: (n, 2) float64 ``(x, y)`` centroids.

Host path: scipy.ndimage.label (C speed, raster-order labels like cv2's SAUF)
with vectorized stats.  An optional C++ accelerator can be dropped in later
with the same interface.  A device path for the batched cc-vote postprocessor
lives in inference/postprocess.py.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

CC_STAT_LEFT = 0
CC_STAT_TOP = 1
CC_STAT_WIDTH = 2
CC_STAT_HEIGHT = 3
CC_STAT_AREA = 4


class ConnectedComponents(NamedTuple):
    num_labels: int
    labels: np.ndarray
    stats: np.ndarray
    centroids: np.ndarray


_STRUCTURE = {
    4: np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=bool),
    8: np.ones((3, 3), dtype=bool),
}


def connected_components_with_stats(image: np.ndarray, connectivity: int = 4) -> ConnectedComponents:
    """cv2.connectedComponentsWithStats-compatible labeling of nonzero pixels.

    Uses the native C++ union-find (native/ps_native.cpp) when built — one
    pass for labels + stats + centroids — with this scipy path as fallback.
    """
    from .. import native

    native_result = native.cc_with_stats(image, connectivity)
    if native_result is not None:
        return ConnectedComponents(*native_result)

    from scipy import ndimage as ndi

    mask = np.asarray(image) != 0
    labels, num_features = ndi.label(mask, structure=_STRUCTURE[connectivity])
    labels = labels.astype(np.int32, copy=False)
    num_labels = num_features + 1

    h, w = mask.shape
    stats = np.zeros((num_labels, 5), dtype=np.int32)
    centroids = np.full((num_labels, 2), np.nan, dtype=np.float64)

    flat = labels.ravel()
    areas = np.bincount(flat, minlength=num_labels)
    rows = np.repeat(np.arange(h, dtype=np.int64), w)
    cols = np.tile(np.arange(w, dtype=np.int64), h)
    sum_rows = np.bincount(flat, weights=rows, minlength=num_labels)
    sum_cols = np.bincount(flat, weights=cols, minlength=num_labels)

    stats[:, CC_STAT_AREA] = areas
    with np.errstate(invalid="ignore", divide="ignore"):
        centroids[:, 0] = sum_cols / areas
        centroids[:, 1] = sum_rows / areas

    objects = ndi.find_objects(labels, max_label=num_features)
    for i, slc in enumerate(objects, start=1):
        if slc is None:
            continue
        ys, xs = slc
        stats[i, CC_STAT_LEFT] = xs.start
        stats[i, CC_STAT_TOP] = ys.start
        stats[i, CC_STAT_WIDTH] = xs.stop - xs.start
        stats[i, CC_STAT_HEIGHT] = ys.stop - ys.start

    # background stats describe the full image extent, like cv2
    stats[0, CC_STAT_LEFT] = 0
    stats[0, CC_STAT_TOP] = 0
    stats[0, CC_STAT_WIDTH] = w
    stats[0, CC_STAT_HEIGHT] = h

    return ConnectedComponents(num_labels, labels, stats, centroids)


def cc_window(cc_stats: np.ndarray, cc_index: int) -> Tuple[slice, slice]:
    """Row/column slices of one component's bounding box.

    Covers the capability of reference cc.py:4-18 (bbox extraction); the
    returned tuple indexes any same-shaped image: ``image[cc_window(...)]``.
    """
    top, left = cc_stats[cc_index, CC_STAT_TOP], cc_stats[cc_index, CC_STAT_LEFT]
    h, w = cc_stats[cc_index, CC_STAT_HEIGHT], cc_stats[cc_index, CC_STAT_WIDTH]
    return slice(top, top + h), slice(left, left + w)
