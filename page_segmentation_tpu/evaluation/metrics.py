"""Offline evaluation metrics.

Capability parity with reference evaluation.py: ``count_matches`` (:8-22 —
NOTE: the reference's fp/fn are swapped relative to its docstring; we
replicate the *behavior*: fp counts mask∧¬pred, fn counts ¬mask∧pred),
``total_accuracy`` (:25-33), ``f1_measures``/``f1`` (:36-49), ``cc_equal``
(:52-53), ``cc_matching`` (:56-68), and ``ConnectedComponentEval``
(:71-117) over the re-owned connected components op.
"""
from __future__ import annotations

from typing import Callable, Generator, Tuple, TypeVar, Union

import numpy as np

from ..ops.cc import cc_bbox_func, connected_components_with_stats

T = TypeVar("T")


def count_matches(mask: np.ndarray, pred: np.ndarray, label: int) -> Tuple[int, int, int]:
    """(tp, fp, fn) with the reference's (swapped) semantics."""
    mask_label = mask == label
    pred_label = pred == label
    tp = np.count_nonzero(np.logical_and(mask_label, pred_label))
    fp = np.count_nonzero(np.logical_and(mask_label, ~pred_label))
    fn = np.count_nonzero(np.logical_and(~mask_label, pred_label))
    return tp, fp, fn


def total_accuracy(mask: np.ndarray, pred: np.ndarray) -> Tuple[int, int]:
    equal = mask == pred
    return np.count_nonzero(equal), equal.size


def f1(precision: float, recall: float) -> float:
    return 2 * precision * recall / (precision + recall)


def f1_measures(tp: int, fp: int, fn: int) -> Tuple[float, float, float]:
    """(precision, recall, f1)."""
    if tp == 0:
        return 0.0, 0.0, 0.0
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    return precision, recall, f1(precision, recall)


def cc_equal(threshold: float) -> Callable[[np.ndarray, np.ndarray], bool]:
    return lambda pred, mask: np.count_nonzero(pred == mask) / np.size(mask) >= threshold


def cc_matching(label: int, threshold_tp: float, threshold_fp: float, threshold_mask: float = None):
    """Per-component matcher: returns [TP, FP, FN] indicator array."""
    if not threshold_mask:
        threshold_mask = threshold_tp

    def match(mask, pred):
        size = np.size(mask)
        pred_match_fp = np.count_nonzero(pred == label) / size >= threshold_fp
        pred_match_tp = np.count_nonzero(pred == label) / size >= threshold_tp
        mask_match = np.count_nonzero(mask == label) / size >= threshold_mask
        return np.array(
            [
                int(pred_match_tp and mask_match),
                int(pred_match_fp and not mask_match),
                int(mask_match and not pred_match_tp),
            ]
        )

    return match


class ConnectedComponentEval:
    """Run a metric per connected component of the binary image, with
    optional label/threshold filtering (reference evaluation.py:71-117)."""

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

    def _filter(self, component: Union[int, np.ndarray], bbox) -> bool:
        if not self.filtered_label:
            return True
        if type(component) is int:
            component = bbox(self.labels) == component
        return (
            self._label_ratio(bbox, self.mask, component) >= self.threshold
            or self._label_ratio(bbox, self.pred, component) > 0
        )

    def _label_ratio(self, bbox, image, component) -> float:
        selected = bbox(image)[component]
        matches = np.count_nonzero(selected == self.filtered_label)
        return matches / np.size(selected)

    def _call_masked(self, component: Union[int, np.ndarray], func, bbox):
        if type(component) is int:
            component = bbox(self.labels) == component
        return func(bbox(self.mask)[component], bbox(self.pred)[component])

    def run_per_component(
        self, func: Callable[[np.ndarray, np.ndarray], T]
    ) -> Generator[T, None, None]:
        for i in range(1, self.num_labels):
            bbox = cc_bbox_func(self.stats, i)
            selection = bbox(self.labels) == i
            if self._filter(selection, bbox):
                yield self._call_masked(selection, func, bbox)
