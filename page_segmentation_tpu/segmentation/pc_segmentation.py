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
    return _cut_canonical(canonical, orig_height, char_height, resize_height,
                          color_map, only_images)


def find_segments_indexed(
    orig_height: int,
    labels: np.ndarray,
    palette: np.ndarray,
    char_height: int,
    resize_height: int,
    color_map: ColorMap,
    only_images: bool = False,
) -> Tuple[List[RectSegment], List[RectSegment]]:
    """``find_segments`` fast path for palette-indexed predictions.

    Nearest resize selects source *pixels*, so resizing the label map and
    palette-gathering RGB afterwards picks exactly the pixels
    ``find_segments`` would — but the 3-byte/px palette expansion happens
    at the tiny canonical scale (~300x212) instead of the full page
    (~90 ms/page measured for a full-page gather on this host).  The 3x3
    RGB dilation and the cut engine are shared verbatim.  Equality-gated
    against ``find_segments`` in tests/test_segmentation_batch.py
    (test_find_segments_indexed_equals_rgb).
    """
    canonical_scale = resize_height / labels.shape[0]
    canonical_w = int(labels.shape[1] * canonical_scale)
    small = resize_nearest_cv(labels, (resize_height, canonical_w))
    palette = np.asarray(palette, np.uint8)
    canonical = dilate(palette[small])
    return _cut_canonical(canonical, orig_height, char_height, resize_height,
                          color_map, only_images)


def _cut_canonical(
    canonical: np.ndarray,
    orig_height: int,
    char_height: int,
    resize_height: int,
    color_map: ColorMap,
    only_images: bool,
) -> Tuple[List[RectSegment], List[RectSegment]]:
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


def text_region_mask(mask: np.ndarray, char_height: int) -> np.ndarray:
    """The char_height-scaled morphology chain on a text-pixel mask
    (reference pc_segmentation.py:82-95) — host backend.

    Fast path: the native bit-packed sliding-window kernel
    (ps_bitmorph_chain, ~2-3x the cv2 van Herk chain at A4 on this
    host), equality-gated against the cv2/scipy composition below for
    odd AND even kernels in tests/test_device_morph.py; the composition
    remains the semantic contract and the no-toolchain fallback."""
    from .device_morph import morph_kernels

    k, k3, k11 = morph_kernels(char_height)
    if mask.ndim == 2:
        from .. import native

        fused = native.bitmorph_chain(mask, k, k3, k11)
        if fused is not None:
            return fused
    # noise removal: close to fill holes, open to drop specks < char/3
    mask = morphology.morph_close(mask, (k, k))
    mask = morphology.morph_open(mask, (k3, k3))
    # grow char-level blobs into line/region blobs, then close them
    region_chars = morphology.dilate(mask, (k11, k11), iterations=1)
    return morphology.morph_close(region_chars, (k11, k11))


def contours_from_region_mask(region_text: np.ndarray) -> List[CVContour]:
    """Final contour extraction from a processed region mask.

    Fill region polygons so enclosed holes vanish, then extract the final
    contours (the reference's draw-then-refind dance, without the
    border-pixel workaround cv2 needs).  The refind can only differ from
    the first find by swallowing components nested inside another
    component's hole; nesting requires bbox containment, so when no
    contour's bbox lies inside another's the second full-image labeling
    pass is skipped — the dominant cost of this stage on large pages
    (equality gated in tests/test_segmentation.py).
    """
    contours = find_external_contours(region_text)
    if _any_bbox_nested(contours):
        filled = np.zeros(region_text.shape, np.uint8)
        for contour in contours:
            fill_contour(filled, contour, 255)
        contours = find_external_contours(filled)
    # reverse to preserve the reference's region ordering
    return [CVContour(c) for c in contours[::-1]]


def get_text_contours(image: np.ndarray, char_height: int, color_map: ColorMap) -> List[CVContour]:
    """Polygonal text regions via char_height-scaled morphology
    (reference pc_segmentation.py:70-116 behavior)."""
    # select text-colored pixels (one SIMD pass; see exact_color_mask)
    mask = exact_color_mask(image, color_map.color_for_label("text"))
    return contours_from_region_mask(text_region_mask(mask, char_height))


def get_text_contours_batch(
    masks,
    char_heights,
    device_morph=None,
) -> List[List[CVContour]]:
    """Batched text contours from text-pixel masks — an (N, H, W) array
    or a sequence of 2-D masks (shapes may differ page to page).

    With ``device_morph`` (a :class:`~.device_morph.TextRegionMorphDevice`)
    the morphology chain runs as one device dispatch per distinct kernel
    triple (kernel extents are static per compiled program — see
    device_morph.py for why).  Without it, the host chain runs per page.
    Both paths are equality-gated in tests/test_device_morph.py.
    """
    from .device_morph import morph_kernels

    if device_morph is not None:
        kernels = [morph_kernels(ch) for ch in char_heights]
        regions = device_morph.run(np.asarray(masks, bool), kernels)
        return [contours_from_region_mask(regions[i])
                for i in range(regions.shape[0])]

    def as_u8(mask: np.ndarray) -> np.ndarray:
        # bool masks reinterpret as 0/1 uint8 for free (same byte
        # layout); the chain's foreground test is nonzero, so no 255
        # rescale pass is needed (native pack tests != 0; the cv2/scipy
        # fallback composition is value-preserving on binary inputs)
        return mask.view(np.uint8) if mask.dtype == bool else \
            np.asarray(mask, np.uint8)

    return [
        contours_from_region_mask(text_region_mask(as_u8(masks[i]), ch))
        for i, ch in enumerate(char_heights)
    ]


def _any_bbox_nested(contours: List[np.ndarray]) -> bool:
    """Conservative nesting pretest: True iff some contour's bbox is
    contained (inclusive) in another's.  Polygon nesting implies bbox
    containment, so False proves the fill-then-refind dance is an
    identity.  Vectorized over the (n, 4) bbox array: noisy pages can
    emit thousands of contours, where a Python double loop would cost
    more than the refind pass this pretest exists to skip."""
    if len(contours) < 2:
        return False
    boxes = np.array(
        [(c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())
         for c in contours],
        np.int64,
    )
    n = len(boxes)
    b = boxes[None, :, :]  # candidate container boxes
    # chunk the candidate-contained axis: the full n x n broadcast is
    # >10 GB at the contour counts a speckle page with char_height 1 can
    # emit (the chain is then a no-op); 512-row blocks keep memory at
    # O(512 n) with the same early exit the scalar loop had
    for start in range(0, n, 512):
        a = boxes[start : start + 512, None, :]
        contained = (
            (a[..., 0] >= b[..., 0]) & (a[..., 1] >= b[..., 1])
            & (a[..., 2] <= b[..., 2]) & (a[..., 3] <= b[..., 3])
        )
        # a box "contains" itself: mask the diagonal of this block
        idx = np.arange(start, min(start + 512, n))
        contained[idx - start, idx] = False
        if contained.any():
            return True
    return False
