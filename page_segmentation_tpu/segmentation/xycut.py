"""Recursive XY-cut page segmentation.

Capability parity with reference xycut.py: region dataclasses
(Region/CVContour/RectSegment/Segment1D/Gap, :10-86), ``do_xy_cut`` (:95),
``recursive_cut`` (:127-161), gap/segment extraction (:112-124, :164-173).

The projection profiles (count_nonzero along an axis) vectorize on device
for batched use; the recursion itself is host-side control flow over tiny
1-D arrays — the correct split for XLA (SURVEY §7.6).
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import List, Tuple, TypeVar, Union

import numpy as np

RGBColor = Tuple[int, int, int]


class Region(ABC):
    @abstractmethod
    def polygon_coords(self) -> Union[List[Tuple[int, int]], np.ndarray]:
        ...

    @abstractmethod
    def scale(self, factor: float) -> "Region":
        ...


@dataclass
class CVContour(Region):
    contour: np.ndarray

    def __post_init__(self):
        self.contour = np.squeeze(self.contour)

    def polygon_coords(self) -> Union[List[Tuple[int, int]], np.ndarray]:
        return np.squeeze(self.contour)

    def scale(self, factor: float) -> "CVContour":
        return CVContour((self.contour * factor).astype("int32"))


@dataclass
class RectSegment(Region):
    x_start: int
    y_start: int
    x_end: int
    y_end: int

    def of(self, image: np.ndarray):
        return image[self.y_start : self.y_end, self.x_start : self.x_end]

    def scale(self, factor: float) -> "RectSegment":
        return RectSegment(
            x_start=int(self.x_start * factor),
            y_start=int(self.y_start * factor),
            x_end=int(self.x_end * factor),
            y_end=int(self.y_end * factor),
        )

    def as_xy(self) -> List[Tuple[int, int]]:
        return [(self.y_start, self.x_start), (self.y_end, self.x_end)]

    def polygon_coords(self) -> Union[List[Tuple[int, int]], np.ndarray]:
        return [
            (self.x_start, self.y_start),
            (self.x_end, self.y_start),
            (self.x_end, self.y_end),
            (self.x_start, self.y_end),
        ]


AnyRegion = TypeVar("AnyRegion", Region, RectSegment, CVContour)


@dataclass
class Segment1D:
    start: int
    end: int

    def __len__(self):
        return self.end - self.start


@dataclass
class Gap:
    start: int
    length: int


def single_color(image: np.ndarray, color: Union[int, np.ndarray]) -> np.ndarray:
    mask = image == color
    if len(image.shape) > 2:
        mask = mask.all(axis=-1)
    return mask


def do_xy_cut(
    binary_image: np.ndarray,
    px_threshold_line: int,
    px_threshold_column: int,
    split_size_horizontal: int,
    split_size_vertical: int,
) -> List[RectSegment]:
    """Recursive XY cut into rectangular regions.

    :param binary_image: boolean/0-1 array, truthy is foreground
    :param px_threshold_line: minimum height to further split horizontally
    :param px_threshold_column: minimum width to further split vertically
    :param split_size_horizontal: free-space pixels for a horizontal cut
    :param split_size_vertical: free-space pixels for a vertical cut
    """
    return recursive_cut(
        binary_image,
        (px_threshold_line, px_threshold_column),
        (split_size_horizontal, split_size_vertical),
        axis=0,
    )


def _get_gaps(indication: np.ndarray) -> List[Gap]:
    no_indication = np.where(~indication)[0]
    consecutive = np.split(no_indication, np.where(np.diff(no_indication) != 1)[0] + 1)
    return [Gap(start=int(run[0]), length=len(run)) for run in consecutive if len(run) > 0]


def _relative_seg(shape, start, end, pos) -> RectSegment:
    return RectSegment(
        x_start=pos[1] + start, x_end=pos[1] + end, y_start=pos[0], y_end=pos[0] + shape[1]
    )


def recursive_cut(
    image: np.ndarray,
    threshold: Tuple[int, int],
    split_size: Tuple[int, int],
    axis: int = 0,
    position: Tuple[int, int] = (0, 0),
    end_recurse: bool = False,
) -> List[RectSegment]:
    # projection profile: enough foreground along `axis` marks occupied lines
    occupied = np.count_nonzero(image, axis=axis) >= threshold[axis]
    gaps = _get_gaps(occupied)
    if len(gaps) == 0:
        return [_relative_seg(image.shape, 0, image.shape[axis], position)]

    segments_for_axis = _get_segments(gaps, image.shape[axis], threshold[axis], split_size[axis])

    if end_recurse:
        return [_relative_seg(image.shape, s.start, s.end, position) for s in segments_for_axis]

    recursive_segments: List[RectSegment] = []
    for seg in segments_for_axis:
        if len(seg) > threshold[axis]:
            if axis == 1:
                window = image[seg.start : seg.end, :]
                pos = (position[0], position[1] + seg.start)
            else:
                window = image[:, seg.start : seg.end]
                pos = (position[0] + seg.start, position[1])

            if any(dim == 0 for dim in window.shape):
                return recursive_segments

            recursive_segments += recursive_cut(
                window, threshold, split_size, 1 - axis, pos, len(segments_for_axis) == 1
            )
    return recursive_segments


def _get_segments(gaps: List[Gap], length: int, px_threshold, split_size) -> List[Segment1D]:
    # drop gaps smaller than the split size, bracket with zero-width sentinels
    gaps = [Gap(0, 0)] + [g for g in gaps if g.length >= split_size] + [Gap(length, 0)]
    segments = []
    for gap, nextgap in zip(gaps, gaps[1:]):
        if nextgap.start - (gap.start + gap.length) > px_threshold:
            segments.append(Segment1D(gap.start + gap.length, nextgap.start))
    return segments
