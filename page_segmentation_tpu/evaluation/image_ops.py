"""Foreground-pixel metrics and line-height estimation.

Capability parity with reference image_ops.py: ``fgpa`` (:8-19),
``fgoverlap_per_class`` (:22-55), ``compute_char_height`` (:58-82 — Otsu
binarize, 4-connected components, letter-shaped box filter
(0.5 < w/h < 2, 10 < h < 60, 5 < w < 50), median height) over the
re-owned threshold/cc ops.  A batched on-device fgpa lives in
train/metrics.py for in-loop use.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ..ops.cc import CC_STAT_HEIGHT, CC_STAT_WIDTH, connected_components_with_stats
from ..ops.threshold import otsu_binarize


def fgpa(pred: np.ndarray, mask: np.ndarray, bin: np.ndarray) -> float:
    """Foreground pixel accuracy (1 = foreground in ``bin``)."""
    pfg = pred * bin
    mfg = mask * bin
    fg_count = np.count_nonzero(bin)
    return (fg_count - np.count_nonzero(pfg != mfg)) / fg_count


def fgoverlap_per_class(
    pred: np.ndarray, mask: np.ndarray, bin: np.ndarray, n_classes: int
) -> Tuple[List[float], List[int], List[int], List[int]]:
    """Per-class foreground overlap (IoU), tp, fp, fn — arrays of length
    n_classes+1 with index 0 = 'not classified' (the background shift)."""
    pfg = (pred + 1) * bin - 1
    mfg = (mask + 1) * bin - 1

    def overlap_class(i: int) -> Tuple[float, int, int, int]:
        actual = (pfg == i).astype(np.uint8)
        expected = (mfg == i).astype(np.uint8)
        pixels_of_interest = actual + expected
        n_interest = np.count_nonzero(pixels_of_interest)
        if n_interest == 0:
            return np.nan, 0, 0, 0
        fp = np.count_nonzero(actual > expected)
        fn = np.count_nonzero(expected > actual)
        tp = np.count_nonzero(pixels_of_interest == 2)
        assert n_interest == fp + fn + tp
        return tp / (tp + fp + fn), tp, fp, fn

    overlaps, tps, fps, fns = map(list, zip(*[overlap_class(i) for i in range(n_classes + 1)]))
    return overlaps, tps, fps, fns


def compute_char_height_arr(img: np.ndarray, inverse: bool) -> Optional[int]:
    """Median letter height from a grayscale array."""
    binary = otsu_binarize(img, invert=inverse)
    _, _, stats, _ = connected_components_with_stats(binary, connectivity=4)

    widths = stats[1:, CC_STAT_WIDTH].astype(np.float64)
    heights = stats[1:, CC_STAT_HEIGHT].astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        letterish = (
            (0.5 < widths / np.maximum(heights, 1e-9))
            & (widths / np.maximum(heights, 1e-9) < 2)
            & (10 < heights)
            & (heights < 60)
            & (5 < widths)
            & (widths < 50)
        )
    valid_heights = np.sort(stats[1:, CC_STAT_HEIGHT][letterish])
    if len(valid_heights) == 0:
        return None
    return int(valid_heights[len(valid_heights) // 2])


def compute_char_height(file_name: str, inverse: bool) -> Optional[int]:
    if not os.path.exists(file_name):
        raise Exception(f"File does not exist at {file_name}")
    from ..core.image_io import imread

    return compute_char_height_arr(imread(file_name, as_gray=True), inverse)
