"""Region rendering back to mask images.

Capability parity with reference render.py: ``render_regions`` (:16-31),
``render_xycut`` (:34-41), ``render_morphological`` (:44-48),
``render_rect_segments`` (:51-58), ``render_ocv_contours`` (:61-65) — PIL
rectangles + polygon fills (no cv2).
"""
from __future__ import annotations

import os
from typing import Callable, List, Tuple

import numpy as np
from PIL import Image, ImageDraw
from PIL.Image import Image as ImageType

from ..core.colors import ColorMap
from ..core.image_io import split_filename
from ..ops.contours import fill_contour
from .xycut import AnyRegion, CVContour, RectSegment, RGBColor


def render_regions(
    output_dir: str,
    extension: str,
    orig_shape: Tuple[int, int],
    prediction_path: str,
    label_colors: ColorMap,
    method: Callable[[Tuple[int, int], ColorMap, List[AnyRegion], List[AnyRegion]], ImageType],
    segments_text: List[AnyRegion],
    segments_image: List[AnyRegion],
) -> str:
    mask_image = method(orig_shape, label_colors, segments_text, segments_image)
    _, image_basename, _ = split_filename(prediction_path)
    os.makedirs(output_dir, exist_ok=True)
    outfile = os.path.join(output_dir, image_basename + "." + extension)
    mask_image.save(outfile)
    return outfile


def render_xycut(
    orig_shape: Tuple[int, int],
    label_colors: ColorMap,
    segments_text: List[RectSegment],
    segments_image: List[RectSegment],
) -> ImageType:
    size = tuple(reversed(orig_shape))
    return render_rect_segments(
        size,
        [
            (label_colors.color_for_label("text"), segments_text),
            (label_colors.color_for_label("image"), segments_image),
        ],
    )


def render_morphological(
    orig_shape: Tuple[int, int],
    label_colors: ColorMap,
    segments_text: List[CVContour],
    segments_image: List[RectSegment],
) -> ImageType:
    mask_image = render_rect_segments(
        orig_shape, [(label_colors.color_for_label("image"), segments_image)]
    )
    return render_contours(mask_image, segments_text, label_colors.color_for_label("text"))


def render_rect_segments(
    size: Tuple[int, int],
    segment_groups: List[Tuple[RGBColor, List[RectSegment]]],
    base_color: Tuple[int, int, int] = (255, 255, 255),
) -> ImageType:
    pil_image = Image.new("RGB", size, base_color)
    canvas = ImageDraw.Draw(pil_image)
    for color, segments in segment_groups:
        for segment in segments:
            canvas.rectangle(segment.as_xy(), fill=color, outline=color)
    return pil_image


def render_contours(
    base_image: ImageType, contours: List[CVContour], color_rgb: RGBColor
) -> ImageType:
    image_arr = np.array(base_image)
    for contour in contours:
        points = np.atleast_2d(contour.contour)
        fill_contour(image_arr, points, np.array(color_rgb, dtype=image_arr.dtype))
    return Image.fromarray(image_arr)


# cv2-named alias kept for reference-API familiarity
render_ocv_contours = render_contours
