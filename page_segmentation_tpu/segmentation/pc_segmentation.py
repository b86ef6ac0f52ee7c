"""Page segmentation from a pixel prediction.

Capability parity with reference pc_segmentation.py: ``find_segments``
(:24-60 — resize to a canonical height, 3x3 dilation, char_height-derived
thresholds, XY cut per label, scale back), ``dilate`` (:63-67), and
``get_text_contours`` (:70-116 — char_height-sized morphological
close/open/dilate + contour extraction for polygonal text regions).

cv2 is absent; morphology and contours are the re-owned ops
(ops/morphology.py, ops/contours.py).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..core.colors import ColorMap
from ..ops import morphology
from ..ops.contours import fill_contour, find_external_contours
from ..ops.resize import resize_nearest
from .xycut import CVContour, RectSegment, do_xy_cut

ColorMapping = Dict[str, np.ndarray]


def seg(left_upper: Tuple[int, int], right_lower: Tuple[int, int]) -> RectSegment:
    return RectSegment(left_upper[0], left_upper[1], right_lower[0], right_lower[1])


DEFAULT_COLOR_MAPPING = {
    "image": np.array([0, 255, 0]),
    "text": np.array([0, 0, 255]),
}


def find_segments(
    orig_height: int,
    image: np.ndarray,
    char_height: int,
    resize_height: int,
    color_map: ColorMap,
    only_images: bool = False,
) -> Tuple[List[RectSegment], List[RectSegment]]:
    """XY-cut text/image segments from an RGB prediction image."""
    # canonical height so the char_height-derived thresholds generalize
    scale_percent = resize_height / image.shape[0]
    height = resize_height
    width = int(image.shape[1] * scale_percent)
    image = resize_nearest(image, (height, width))
    image = dilate(image)

    absolute_resize_factor = height / orig_height
    px_threshold_line = int(char_height * absolute_resize_factor)
    px_threshold_column = int(char_height * absolute_resize_factor)
    split_size_horizontal = int(char_height * 2 * absolute_resize_factor)
    split_size_vertical = int(char_height * absolute_resize_factor)

    def scale_all(segments, factor):
        return [s.scale(factor) for s in segments]

    segments_image = do_xy_cut(
        color_map.filter_label(image, "image"),
        px_threshold_line,
        px_threshold_column,
        split_size_horizontal,
        split_size_vertical,
    )
    segments_image = scale_all(segments_image, 1.0 / absolute_resize_factor)

    if only_images:
        segments_text: List[RectSegment] = []
    else:
        segments_text = do_xy_cut(
            color_map.filter_label(image, "text"),
            px_threshold_line,
            px_threshold_column,
            split_size_horizontal,
            split_size_vertical,
        )
        segments_text = scale_all(segments_text, 1.0 / absolute_resize_factor)

    return segments_text, segments_image


def dilate(bin_image: np.ndarray) -> np.ndarray:
    """3x3 dilation (reference pc_segmentation.py:63-67); per-channel on RGB."""
    return morphology.dilate(bin_image, (3, 3), iterations=1)


def get_text_contours(image: np.ndarray, char_height: int, color_map: ColorMap) -> List[CVContour]:
    """Polygonal text regions via char_height-scaled morphology
    (reference pc_segmentation.py:70-116 behavior)."""
    color = np.array(color_map.color_for_label("text"))

    # select text-colored pixels (cv2.inRange equivalent)
    mask = (np.asarray(image)[..., :3] == color).all(axis=-1).astype(np.uint8) * 255

    # noise removal: close to fill holes, open to drop specks < char/3
    k = max(int(char_height), 1)
    mask = morphology.morph_close(mask, (k, k))
    k3 = max(int(char_height / 3), 1)
    mask = morphology.morph_open(mask, (k3, k3))

    # grow char-level blobs into line/region blobs, then close them
    k11 = max(int(char_height / 1.1), 1)
    region_chars = morphology.dilate(mask, (k11, k11), iterations=1)
    region_text = morphology.morph_close(region_chars, (k11, k11))

    # fill region polygons so enclosed holes vanish, then extract the final
    # contours (the reference's draw-then-refind dance, without the
    # border-pixel workaround cv2 needs)
    filled = np.zeros(region_text.shape, np.uint8)
    for contour in find_external_contours(region_text):
        fill_contour(filled, contour, 255)

    contours = find_external_contours(filled)
    # reverse to preserve the reference's region ordering
    return [CVContour(c) for c in contours[::-1]]
