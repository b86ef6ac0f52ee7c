"""Static-shape padding & bucketing.

The reference pads inside the TF graph to the next multiple of 32 and crops
back (reference model.py:10-42 ``calculate_padding``/``pad``/``crop`` Lambdas)
so arbitrary page shapes flow through the conv stack.  Under XLA every shape
is compiled, so the TPU-native design moves pad/crop *outside* the jitted
model: pages are padded to a small set of bucketed shapes (multiple-of-32,
optionally coarser) so the model compiles a handful of times, and logits are
cropped back exactly afterwards.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

STRIDE_FACTOR = 32  # product of the encoder's pooling strides (2^5 covers all archs)


def padding_for(shape: Sequence[int], factor: int = STRIDE_FACTOR) -> Tuple[int, int]:
    """(pad_h, pad_w) to the next multiple of ``factor``
    (reference model.py:10-17 semantics)."""
    h, w = int(shape[0]), int(shape[1])
    return (factor - h % factor) % factor, (factor - w % factor) % factor


def round_up(value: int, factor: int) -> int:
    return -(-int(value) // factor) * factor


def bucket_shape(shape: Sequence[int], factor: int = STRIDE_FACTOR, granularity: int = 1) -> Tuple[int, int]:
    """Bucketed target shape: multiple of ``factor * granularity``.

    Coarser granularity = fewer XLA recompiles at the cost of more padded
    FLOPs.  granularity=4 pads to multiples of 128 — MXU/VPU lane aligned.
    """
    step = factor * granularity
    return round_up(shape[0], step), round_up(shape[1], step)


def pad_to(image: np.ndarray, target: Sequence[int], value=0) -> np.ndarray:
    """Zero-pad bottom/right to ``target`` (H, W); channels untouched."""
    th, tw = int(target[0]), int(target[1])
    h, w = image.shape[:2]
    if (h, w) == (th, tw):
        return image
    pad_width = [(0, th - h), (0, tw - w)] + [(0, 0)] * (image.ndim - 2)
    return np.pad(image, pad_width, mode="constant", constant_values=value)


def crop_to(array: np.ndarray, shape: Sequence[int]) -> np.ndarray:
    """Crop top-left (H, W) region — the inverse of pad_to
    (reference model.py:29-42)."""
    return array[: int(shape[0]), : int(shape[1])]


def bucket_report(
    shapes: Sequence[Sequence[int]],
    factor: int = STRIDE_FACTOR,
    granularities: Sequence[int] = (1, 2, 4, 8),
) -> dict:
    """Bucketing-policy study over a page-shape distribution.

    For each granularity: how many distinct buckets the shapes fall into
    (= XLA compiles) and the mean padded-FLOPs overhead (padded pixels /
    real pixels − 1).  The trade is explicit: coarser buckets compile
    less and pad more.
    """
    report = {}
    for granularity in granularities:
        buckets = {}
        real = padded = 0
        for shape in shapes:
            bucket = bucket_shape(shape, factor, granularity)
            buckets[bucket] = buckets.get(bucket, 0) + 1
            real += int(shape[0]) * int(shape[1])
            padded += bucket[0] * bucket[1]
        report[int(granularity)] = {
            "buckets": len(buckets),
            "padding_overhead": padded / real - 1.0 if real else 0.0,
            "largest_bucket_share": (max(buckets.values()) / len(shapes)) if shapes else 0.0,
        }
    return report


def suggest_granularity(
    shapes: Sequence[Sequence[int]],
    factor: int = STRIDE_FACTOR,
    max_buckets: int = 8,
    granularities: Sequence[int] = (1, 2, 4, 8, 16),
) -> int:
    """Smallest-overhead granularity whose bucket count (compile count)
    stays within ``max_buckets``; falls back to the coarsest option."""
    report = bucket_report(shapes, factor, granularities)
    eligible = [g for g, r in report.items() if r["buckets"] <= max_buckets]
    if not eligible:
        return max(report, key=lambda g: g)
    return min(eligible, key=lambda g: report[g]["padding_overhead"])
