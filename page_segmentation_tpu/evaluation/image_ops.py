"""Foreground-pixel metrics and line-height estimation.

Capability parity with reference image_ops.py: ``fgpa`` (:8-19),
``fgoverlap_per_class`` (:22-55), ``compute_char_height`` (:58-82 — Otsu
binarize, 4-connected components, letter-shaped box filter
(0.5 < w/h < 2, 10 < h < 60, 5 < w < 50), upper-median height — the
reference's ``sorted[len//2]``, which for even counts picks the upper
middle rather than the interpolated median; replicated, not "fixed")
over the re-owned threshold/cc ops.  A batched on-device fgpa lives in
train/metrics.py for in-loop use.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ..ops.cc import CC_STAT_HEIGHT, CC_STAT_WIDTH, connected_components_with_stats
from ..ops.threshold import otsu_binarize


def _fg_confusion(pred: np.ndarray, mask: np.ndarray, bin: np.ndarray, n_labels: int) -> np.ndarray:
    """(n_labels+2)² confusion matrix over foreground pixels.

    Row = ground-truth label, column = predicted label, offset by one so
    row/column 0 holds the non-foreground pixels (``bin == 0``), which by
    construction never mix with real labels; the final row/column absorbs
    out-of-range labels (they count as "some other class" — a mismatch for
    every tracked label, matching the per-class scans they replace).  One
    ``bincount`` pass replaces the reference's per-class boolean scans
    (image_ops.py:22-55).
    """
    fg = bin.reshape(-1) != 0
    side = n_labels + 2

    def bucket(values):
        v = values.reshape(-1).astype(np.int64)
        out_of_range = (v < 0) | (v >= n_labels)
        slot = np.where(out_of_range, side - 1, v + 1)
        return np.where(fg, slot, 0)

    p, m = bucket(pred), bucket(mask)
    return np.bincount(m * side + p, minlength=side * side).reshape(side, side)


def fgpa(pred: np.ndarray, mask: np.ndarray, bin: np.ndarray) -> float:
    """Foreground pixel accuracy (1 = foreground in ``bin``).

    Same quantity as reference image_ops.py:8-19: the fraction of
    foreground pixels whose predicted label matches the mask.
    """
    fg = bin != 0
    correct = np.count_nonzero(fg & (pred == mask))
    # a page without foreground (blank binary) scores 0, not a crash —
    # matching the in-graph twin's guard (train/metrics.py)
    return correct / max(np.count_nonzero(fg), 1)


def fgoverlap_per_class(
    pred: np.ndarray, mask: np.ndarray, bin: np.ndarray, n_classes: int
) -> Tuple[List[float], List[int], List[int], List[int]]:
    """Per-class foreground overlap (IoU), tp, fp, fn.

    Reference image_ops.py:22-55 contract: four lists of length
    ``n_classes + 1`` indexed by label value (0 = 'not classified');
    classes with no pixels of interest report ``nan`` overlap.  Derived
    here from one shared confusion matrix instead of per-class masks.
    """
    n_labels = n_classes + 1  # label values 0..n_classes
    conf = _fg_confusion(pred, mask, bin, n_labels)
    # rows/cols: 0 = non-foreground, 1..n_labels = labels, last = out-of-
    # range labels (count as mismatches for every tracked label).  fg
    # pixels never pair with the non-fg slot (bin masks both maps), so
    # summing from column/row 1 is exact.
    labels = slice(1, n_labels + 1)
    per_gt = conf[labels, 1:].sum(axis=1)
    per_pred = conf[1:, labels].sum(axis=0)
    tp = np.diagonal(conf)[labels]
    fp = per_pred - tp
    fn = per_gt - tp
    interest = tp + fp + fn
    with np.errstate(invalid="ignore"):
        overlap = np.where(interest > 0, tp / np.maximum(interest, 1), np.nan)
    return overlap.tolist(), tp.tolist(), fp.tolist(), fn.tolist()


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
