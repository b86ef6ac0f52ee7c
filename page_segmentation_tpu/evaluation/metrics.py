"""Offline evaluation metrics.

Capability parity with reference evaluation.py: ``count_matches`` (:8-22 —
NOTE: the reference's fp/fn are swapped relative to its docstring; we
replicate the *behavior*: fp counts mask∧¬pred, fn counts ¬mask∧pred),
``total_accuracy`` (:25-33), ``f1_measures``/``f1`` (:36-49), ``cc_equal``
(:52-53), ``cc_matching`` (:56-68), and ``ConnectedComponentEval``
(:71-117) over the re-owned connected components op.
"""
from __future__ import annotations

from typing import Callable, Generator, Iterator, Tuple, TypeVar

import numpy as np

from ..ops.cc import cc_window, connected_components_with_stats

T = TypeVar("T")


def count_matches(mask: np.ndarray, pred: np.ndarray, label: int) -> Tuple[int, int, int]:
    """(tp, fp, fn) for one label, with the reference's (swapped) semantics.

    Counted in one pass over the 2-bit code ``2·[mask==label] + [pred==label]``:
    code 3 = tp, code 2 = fp (in mask only), code 1 = fn (in pred only).
    """
    code = 2 * (mask == label).astype(np.int8) + (pred == label).astype(np.int8)
    counts = np.bincount(code.reshape(-1), minlength=4)
    return int(counts[3]), int(counts[2]), int(counts[1])


def total_accuracy(mask: np.ndarray, pred: np.ndarray) -> Tuple[int, int]:
    """(correct, total) pixel counts across all classes."""
    wrong = np.count_nonzero(mask != pred)
    return mask.size - wrong, mask.size


def f1(precision: float, recall: float) -> float:
    return 2 * precision * recall / (precision + recall)


def f1_measures(tp: int, fp: int, fn: int) -> Tuple[float, float, float]:
    """(precision, recall, f1); all-zero when there are no true positives."""
    if tp == 0:
        return 0.0, 0.0, 0.0
    precision, recall = tp / (tp + fp), tp / (tp + fn)
    return precision, recall, f1(precision, recall)


def _coverage(values: np.ndarray, label: int) -> float:
    """Fraction of ``values`` equal to ``label``."""
    return np.count_nonzero(values == label) / values.size


def cc_equal(threshold: float) -> Callable[[np.ndarray, np.ndarray], bool]:
    """Component matcher: true when ≥ ``threshold`` of the pixels agree."""

    def agree(pred: np.ndarray, mask: np.ndarray) -> bool:
        return 1.0 - np.count_nonzero(pred != mask) / mask.size >= threshold

    return agree


def cc_matching(label: int, threshold_tp: float, threshold_fp: float, threshold_mask: float = None):
    """Per-component matcher returning a ``[tp, fp, fn]`` indicator array.

    A component counts as predicted when its ``label`` coverage in the
    prediction clears ``threshold_tp`` (or the looser ``threshold_fp`` for
    false-positive counting), and as expected when the mask coverage
    clears ``threshold_mask`` (defaults to ``threshold_tp``).
    """
    threshold_mask = threshold_mask or threshold_tp

    def match(mask: np.ndarray, pred: np.ndarray) -> np.ndarray:
        pred_cov = _coverage(pred, label)
        expected = _coverage(mask, label) >= threshold_mask
        predicted = pred_cov >= threshold_tp
        loosely_predicted = pred_cov >= threshold_fp
        return np.array(
            [
                int(predicted and expected),
                int(loosely_predicted and not expected),
                int(expected and not predicted),
            ]
        )

    return match


class ConnectedComponentEval:
    """Evaluate a metric on each connected component of the binary image.

    Reference evaluation.py:71-117 capability: components come from the
    re-owned connectedComponentsWithStats; ``only_label`` restricts the run
    to components that carry the label in the mask (≥ threshold coverage)
    or anywhere in the prediction.  Internally each component is reduced
    to the (mask, pred) pixel vectors inside its bounding box once, and
    both the filter and the metric consume those vectors.
    """

    def __init__(
        self,
        mask: np.ndarray,
        prediction: np.ndarray,
        binary_image: np.ndarray,
        connectivity: int = 4,
    ):
        if binary_image.ndim > 2:
            raise ValueError("Binary image must be 2-dimensional")
        self.mask = mask
        self.pred = prediction
        self.binary_image = binary_image
        self.filtered_label = None
        self.threshold = None
        self.num_labels, self.labels, self.stats, self.centroids = connected_components_with_stats(
            binary_image.astype("uint8"), connectivity=connectivity
        )

    def only_label(self, label: int, threshold: float) -> "ConnectedComponentEval":
        self.filtered_label = label
        self.threshold = threshold
        return self

    def _component_pixels(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (mask_pixels, pred_pixels) vectors per component."""
        for i in range(1, self.num_labels):
            window = cc_window(self.stats, i)
            inside = self.labels[window] == i
            yield self.mask[window][inside], self.pred[window][inside]

    def _keep(self, mask_px: np.ndarray, pred_px: np.ndarray) -> bool:
        if self.filtered_label is None:  # falsy check would disable label 0
            return True
        return (
            _coverage(mask_px, self.filtered_label) >= self.threshold
            or _coverage(pred_px, self.filtered_label) > 0
        )

    def run_per_component(
        self, func: Callable[[np.ndarray, np.ndarray], T]
    ) -> Generator[T, None, None]:
        return (
            func(mask_px, pred_px)
            for mask_px, pred_px in self._component_pixels()
            if self._keep(mask_px, pred_px)
        )
