"""RGB <-> label codec.

Rebuild of the external ``ocr4all-pylib`` ColorMap the reference depends on
(requirements.in:11).  The five operations the reference consumes:

* ``imread_labels``   (reference dataset.py:181)
* ``to_rgb_array``    (reference output.py:45, callback.py:93,100)
* ``color_for_label`` (reference render.py:38-39)
* ``filter_label``    (reference pc_segmentation.py:48,56)
* JSON "image map" load/save (``--color_map image_map.json`` in
  reference examples/model-training-example.sh:24)

The on-disk JSON format maps a stringified RGB tuple to ``[index, label]``::

    {"(255, 255, 255)": [0, "background"], "(255, 0, 0)": [1, "paragraph"]}
"""
from __future__ import annotations

import json
from typing import Dict, Iterable, Mapping, Tuple, Union

import numpy as np

RGBColor = Tuple[int, int, int]
ColorKey = Union[str, RGBColor]


def _parse_color(key: ColorKey) -> RGBColor:
    if isinstance(key, str):
        stripped = key.strip().strip("()[]")
        parts = [p for p in stripped.replace(",", " ").split() if p]
        if len(parts) != 3:
            raise ValueError(f"Cannot parse color key {key!r}")
        return tuple(int(p) for p in parts)  # type: ignore[return-value]
    color = tuple(int(c) for c in key)
    if len(color) != 3:
        raise ValueError(f"Color must have 3 components, got {key!r}")
    return color  # type: ignore[return-value]


class ColorMap:
    """Bidirectional mapping between RGB colors, integer labels, and names."""

    def __init__(self, mapping: Mapping[ColorKey, Tuple[int, str]]):
        self._color_to_entry: Dict[RGBColor, Tuple[int, str]] = {}
        for key, (index, label) in mapping.items():
            self._color_to_entry[_parse_color(key)] = (int(index), str(label))

        self._index_to_color: Dict[int, RGBColor] = {}
        self._label_to_color: Dict[str, RGBColor] = {}
        for color, (index, label) in sorted(self._color_to_entry.items(), key=lambda kv: kv[1][0]):
            # first color registered for an index/label wins (stable for duplicates)
            self._index_to_color.setdefault(index, color)
            self._label_to_color.setdefault(label, color)

    # ------------------------------------------------------------------ basic
    def __len__(self) -> int:
        return len(self._color_to_entry)

    def __contains__(self, color: ColorKey) -> bool:
        return _parse_color(color) in self._color_to_entry

    def __eq__(self, other) -> bool:
        return isinstance(other, ColorMap) and other._color_to_entry == self._color_to_entry

    def __repr__(self) -> str:
        return f"ColorMap({self._color_to_entry!r})"

    @property
    def mapping(self) -> Dict[RGBColor, Tuple[int, str]]:
        return dict(self._color_to_entry)

    @property
    def n_classes(self) -> int:
        if not self._index_to_color:
            return 0
        return max(self._index_to_color) + 1

    @property
    def labels(self) -> Iterable[str]:
        return list(self._label_to_color)

    # ------------------------------------------------------------------- I/O
    @classmethod
    def load(cls, path) -> "ColorMap":
        with open(path, "r") as f:
            raw = json.load(f)
        return cls({k: (v[0], v[1]) for k, v in raw.items()})

    def save(self, path) -> None:
        with open(path, "w") as f:
            json.dump({str(c): list(e) for c, e in self._color_to_entry.items()}, f, indent=2)

    # --------------------------------------------------------------- queries
    def color_for_label(self, label: str) -> RGBColor:
        return self._label_to_color[label]

    def color_for_index(self, index: int) -> RGBColor:
        return self._index_to_color[index]

    def index_for_label(self, label: str) -> int:
        return self._color_to_entry[self._label_to_color[label]][0]

    def label_for_index(self, index: int) -> str:
        return self._color_to_entry[self._index_to_color[index]][1]

    # ---------------------------------------------------------------- arrays
    @property
    def palette(self) -> np.ndarray:
        """(n_classes, 3) uint8 palette; unmapped indices are black."""
        pal = np.zeros((max(self.n_classes, 1), 3), dtype=np.uint8)
        for index, color in self._index_to_color.items():
            pal[index] = color
        return pal

    def to_rgb_array(self, labels: np.ndarray) -> np.ndarray:
        """Label image -> RGB uint8 image (reference output.py:45 semantics)."""
        labels = np.asarray(labels)
        pal = self.palette
        clipped = np.clip(labels.astype(np.int64), 0, pal.shape[0] - 1)
        return pal[clipped]

    def to_labels(self, rgb: np.ndarray) -> np.ndarray:
        """RGB image -> int32 label image.  Unknown colors map to 0."""
        rgb = np.asarray(rgb)
        if rgb.ndim == 2:  # grayscale mask: treat values as labels directly
            return rgb.astype(np.int32)
        if rgb.shape[-1] == 4:
            rgb = rgb[..., :3]
        # pack RGB into a single int for a vectorized table lookup
        packed = (
            rgb[..., 0].astype(np.int64) << 16
            | rgb[..., 1].astype(np.int64) << 8
            | rgb[..., 2].astype(np.int64)
        )
        out = np.zeros(rgb.shape[:-1], dtype=np.int32)
        for color, (index, _label) in self._color_to_entry.items():
            key = (color[0] << 16) | (color[1] << 8) | color[2]
            out[packed == key] = index
        return out

    def imread_labels(self, path) -> np.ndarray:
        from .image_io import imread_rgb

        return self.to_labels(imread_rgb(path))

    def filter_label(self, image: np.ndarray, label: str) -> np.ndarray:
        """Binary uint8 mask of pixels exactly matching the label's color.

        Matches reference pc_segmentation.py:48 usage where the result feeds
        ``np.count_nonzero`` based projection profiles.
        """
        image = np.asarray(image)
        if image.ndim == 2:
            return (image == self.index_for_label(label)).astype(np.uint8)
        return exact_color_mask(image, self.color_for_label(label)) >> 7


def exact_color_mask(image: np.ndarray, color: RGBColor) -> np.ndarray:
    """0/255 uint8 mask of pixels exactly matching ``color``.

    One SIMD pass via cv2.inRange when available (the numpy
    compare-all-astype chain costs ~0.2 s on a 300-DPI A4 page, ~20x
    this); the numpy fallback is the semantic contract and the two are
    equality-gated in tests/test_cv2_parity_live.py.
    """
    image = np.ascontiguousarray(np.asarray(image)[..., :3])
    try:
        import cv2

        if image.dtype == np.uint8:
            lohi = np.asarray(color, np.uint8)
            return cv2.inRange(image, lohi, lohi)
    except ImportError:  # pragma: no cover - depends on host
        pass
    color_arr = np.asarray(color, dtype=image.dtype)
    return (image == color_arr).all(axis=-1).astype(np.uint8) * 255


DEFAULT_IMAGE_MAP = ColorMap(
    {
        (255, 255, 255): (0, "background"),
        (255, 0, 0): (1, "text"),
        (0, 255, 0): (2, "image"),
    }
)
