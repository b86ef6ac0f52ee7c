"""Region rendering back to mask images.

Covers the capability of reference render.py:16-65 (rect/contour region
rasterization for the segmentation CLI) on a numpy canvas: rectangles are
inclusive slice fills, polygons go through the re-owned ``fill_contour``
(no cv2), and PIL only wraps the finished array for saving.

Region masks are flat-color canvases with a handful of distinct colors,
so the CLI path paints single-byte *palette-index* canvases and saves
paletted PNGs: one third the bytes through memory and zlib measured the
A4 encode 147 -> 44 ms on this host, and any standards-conforming PNG
decoder (cv2.imread, PIL ``convert('RGB')``) recovers pixel-identical
RGB.  ``render_rect_segments``/``render_contours`` keep their RGB-array
semantics for reference-API familiarity (ref render.py:51-58,61-65).

Coordinate quirks preserved from the reference: ``render_xycut`` reverses
``orig_shape`` into a (width, height) canvas size while
``render_morphological`` passes it through unreversed (ref render.py:37,47),
and rectangle fills include both endpoints (PIL semantics).
"""
from __future__ import annotations

import os
from typing import Callable, List, Sequence, Tuple

import numpy as np
from PIL import Image
from PIL.Image import Image as ImageType

from ..core.colors import ColorMap
from ..core.image_io import split_filename
from ..ops.contours import fill_contour
from .xycut import AnyRegion, CVContour, RectSegment, RGBColor

WHITE: RGBColor = (255, 255, 255)


def _canvas(pil_size: Tuple[int, int], color: RGBColor) -> np.ndarray:
    """H×W×3 array for a PIL-convention (width, height) size."""
    width, height = pil_size
    return np.broadcast_to(np.asarray(color, np.uint8), (height, width, 3)).copy()


def _index_canvas(pil_size: Tuple[int, int]) -> np.ndarray:
    """H×W uint8 palette-index canvas (index 0 = base color)."""
    width, height = pil_size
    return np.zeros((height, width), np.uint8)


def _palette_image(indices: np.ndarray, palette: Sequence[RGBColor]) -> ImageType:
    """Wrap an index canvas as a paletted PIL image."""
    image = Image.fromarray(indices, "P")
    flat = bytearray(768)  # PNG palettes are 256 RGB triples
    for i, color in enumerate(palette):
        flat[3 * i : 3 * i + 3] = bytes(color)
    image.putpalette(bytes(flat))
    return image


def _paint_rects(canvas: np.ndarray, rects: Sequence[RectSegment], fill) -> None:
    """Fill rectangles in place; endpoints inclusive, as PIL draws them.

    Per the RectSegment convention x indexes rows and y indexes columns.
    Rectangles fully outside the canvas paint nothing (a raw negative end
    index would wrap into a from-the-end slice and flood the canvas).
    ``fill`` is an RGB triple for H×W×3 canvases or a palette index for
    H×W index canvases.
    """
    fill = np.asarray(fill, canvas.dtype)
    for r in rects:
        if r.x_end < 0 or r.y_end < 0:
            continue
        canvas[max(r.x_start, 0) : r.x_end + 1, max(r.y_start, 0) : r.y_end + 1] = fill


def _paint_contours(canvas: np.ndarray, contours: Sequence[CVContour], fill) -> None:
    fill = np.asarray(fill, canvas.dtype)
    for contour in contours:
        fill_contour(canvas, np.atleast_2d(contour.contour), fill)


def render_rect_segments(
    size: Tuple[int, int],
    segment_groups: List[Tuple[RGBColor, List[RectSegment]]],
    base_color: RGBColor = WHITE,
) -> ImageType:
    canvas = _canvas(size, base_color)
    for color, segments in segment_groups:
        _paint_rects(canvas, segments, color)
    return Image.fromarray(canvas)


def render_contours(
    base_image: ImageType, contours: List[CVContour], color_rgb: RGBColor
) -> ImageType:
    canvas = np.array(base_image)
    _paint_contours(canvas, contours, color_rgb)
    return Image.fromarray(canvas)


def render_xycut(
    orig_shape: Tuple[int, int],
    label_colors: ColorMap,
    segments_text: List[RectSegment],
    segments_image: List[RectSegment],
) -> ImageType:
    indices = _index_canvas(tuple(reversed(orig_shape)))
    palette = [
        WHITE,
        label_colors.color_for_label("text"),
        label_colors.color_for_label("image"),
    ]
    _paint_rects(indices, segments_text, 1)
    _paint_rects(indices, segments_image, 2)
    return _palette_image(indices, palette)


def render_morphological(
    orig_shape: Tuple[int, int],
    label_colors: ColorMap,
    segments_text: List[CVContour],
    segments_image: List[RectSegment],
) -> ImageType:
    indices = _index_canvas(orig_shape)
    palette = [
        WHITE,
        label_colors.color_for_label("image"),
        label_colors.color_for_label("text"),
    ]
    _paint_rects(indices, segments_image, 1)
    _paint_contours(indices, segments_text, 2)
    return _palette_image(indices, palette)


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
    """Rasterize segments with ``method`` and save next to the prediction's
    basename; returns the written path."""
    os.makedirs(output_dir, exist_ok=True)
    page_name = split_filename(prediction_path)[1]
    outfile = os.path.join(output_dir, f"{page_name}.{extension}")
    image = method(orig_shape, label_colors, segments_text, segments_image)
    if image.mode == "P" and extension.lower() not in ("png",):
        # JPEG and friends cannot encode palette images
        image = image.convert("RGB")
    if extension.lower() == "png":
        if image.mode == "P":
            # in-module sub-byte indexed encoder: the 3-entry region
            # palette packs depth-2 (1/4 the zlib input), ~20 -> ~7 ms
            # per A4 canvas vs the PIL level-1 save; decoded pixels
            # identical (tests/test_segmentation.py render gates).
            # Trailing never-referenced palette entries are trimmed —
            # referenced indices bound the legal depth.
            from ..core.image_io import imsave_indexed

            indices = np.asarray(image)
            flat = image.getpalette()
            palette = np.asarray(flat, np.uint8).reshape(-1, 3)
            n = max(int(indices.max()) + 1 if indices.size else 1, 1)
            imsave_indexed(outfile, indices, palette[:n])
            return outfile
        # zlib level 1: identical decoded pixels, ~2x faster encode of the
        # flat-color A4 canvas (the encode is on the stage's critical path)
        image.save(outfile, compress_level=1)
    else:
        image.save(outfile)
    return outfile


# cv2-named alias kept for reference-API familiarity
render_ocv_contours = render_contours
