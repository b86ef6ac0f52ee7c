"""Page segmentation from a pixel prediction.

Capability parity with reference pc_segmentation.py: ``find_segments``
(:24-60 — resize to a canonical height, 3x3 dilation, char_height-derived
thresholds, XY cut per label, scale back), ``dilate`` (:63-67), and
``get_text_contours`` (:70-116 — char_height-sized morphological
close/open/dilate + contour extraction for polygonal text regions).

Morphology, contours and the canonical-height nearest resize are the
re-owned ops (ops/morphology.py, ops/contours.py, ops/resize.py
``resize_nearest_cv``) — each gated bit-exact against real cv2 where it
is installed (tests/test_cv2_parity_live.py) and against frozen cv2
outputs everywhere (tests/oracles/).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from ..core.colors import ColorMap, exact_color_mask
from ..ops import morphology
from ..ops.contours import fill_contour, find_external_contours
from ..ops.resize import resize_nearest_cv
from .xycut import CVContour, RectSegment, do_xy_cut

ColorMapping = Dict[str, np.ndarray]


def seg(left_upper: Tuple[int, int], right_lower: Tuple[int, int]) -> RectSegment:
    return RectSegment(left_upper[0], left_upper[1], right_lower[0], right_lower[1])


DEFAULT_COLOR_MAPPING = {
    "image": np.array([0, 255, 0]),
    "text": np.array([0, 0, 255]),
}


@dataclass(frozen=True)
class CutThresholds:
    """XY-cut decision thresholds at the canonical working scale.

    The int-truncation of ``char_height * factor`` is the behavioral
    contract (reference pc_segmentation.py:38-42): a projection row or
    column counts as occupied at one char height's worth of label pixels,
    and occupied runs split at gaps of two char heights (horizontal) or
    one (vertical).
    """

    occupied_px: int  # min label pixels for a row/column to count (both axes)
    gap_horizontal: int  # min empty-run length that splits, horizontal cuts
    gap_vertical: int  # ... vertical cuts

    @classmethod
    def at_scale(cls, char_height: int, factor: float) -> "CutThresholds":
        return cls(
            occupied_px=int(char_height * factor),
            gap_horizontal=int(char_height * 2 * factor),
            gap_vertical=int(char_height * factor),
        )

    def cut(self, label_mask: np.ndarray) -> List[RectSegment]:
        return do_xy_cut(
            label_mask,
            self.occupied_px,
            self.occupied_px,
            self.gap_horizontal,
            self.gap_vertical,
        )


def find_segments(
    orig_height: int,
    image: np.ndarray,
    char_height: int,
    resize_height: int,
    color_map: ColorMap,
    only_images: bool = False,
) -> Tuple[List[RectSegment], List[RectSegment]]:
    """XY-cut text/image segments from an RGB prediction image.

    Reference contract pc_segmentation.py:24-60: work at a canonical
    ``resize_height`` (so char_height-derived thresholds generalize across
    page sizes), dilate 3x3 to bridge hairline gaps, cut each label's
    pixel set, and report rectangles in the ORIGINAL page's coordinates —
    ``orig_height`` is the pre-prediction page height, which is why the
    rescale factor keys on it and not on ``image.shape``.
    """
    # scale factor computed FIRST, then applied — int(w * (rh/h)) and
    # int(w*rh/h) disagree on hundreds of (h, w) shapes (e.g. 700x700 at
    # rh=300: 299 vs 300), and the reference's rounding is the contract.
    # resize_nearest_cv reproduces cv2's INTER_NEAREST pixel selection
    # (reference pc_segmentation.py:31), not the skimage convention the
    # dataset path uses — the two pick different source pixels.
    canonical_scale = resize_height / image.shape[0]
    canonical_w = int(image.shape[1] * canonical_scale)
    canonical = dilate(resize_nearest_cv(image, (resize_height, canonical_w)))

    to_canonical = resize_height / orig_height
    thresholds = CutThresholds.at_scale(char_height, to_canonical)

    def segments_for(label: str) -> List[RectSegment]:
        rects = thresholds.cut(color_map.filter_label(canonical, label))
        return [r.scale(1.0 / to_canonical) for r in rects]

    segments_image = segments_for("image")
    segments_text = [] if only_images else segments_for("text")
    return segments_text, segments_image


def dilate(bin_image: np.ndarray) -> np.ndarray:
    """3x3 dilation (reference pc_segmentation.py:63-67); per-channel on RGB."""
    return morphology.dilate(bin_image, (3, 3), iterations=1)


def get_text_contours(image: np.ndarray, char_height: int, color_map: ColorMap) -> List[CVContour]:
    """Polygonal text regions via char_height-scaled morphology
    (reference pc_segmentation.py:70-116 behavior)."""
    # select text-colored pixels (one SIMD pass; see exact_color_mask)
    mask = exact_color_mask(image, color_map.color_for_label("text"))

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
    # border-pixel workaround cv2 needs).  The refind can only differ from
    # the first find by swallowing components nested inside another
    # component's hole; nesting requires bbox containment, so when no
    # contour's bbox lies inside another's the second full-image labeling
    # pass is skipped — the dominant cost of this stage on large pages
    # (equality gated in tests/test_segmentation.py).
    contours = find_external_contours(region_text)
    if _any_bbox_nested(contours):
        filled = np.zeros(region_text.shape, np.uint8)
        for contour in contours:
            fill_contour(filled, contour, 255)
        contours = find_external_contours(filled)
    # reverse to preserve the reference's region ordering
    return [CVContour(c) for c in contours[::-1]]


def _any_bbox_nested(contours: List[np.ndarray]) -> bool:
    """Conservative nesting pretest: True iff some contour's bbox is
    contained (inclusive) in another's.  Polygon nesting implies bbox
    containment, so False proves the fill-then-refind dance is an
    identity."""
    boxes = [
        (int(c[:, 0].min()), int(c[:, 1].min()),
         int(c[:, 0].max()), int(c[:, 1].max()))
        for c in contours
    ]
    for i, a in enumerate(boxes):
        for j, b in enumerate(boxes):
            if i != j and a[0] >= b[0] and a[1] >= b[1] and a[2] <= b[2] and a[3] <= b[3]:
                return True
    return False
