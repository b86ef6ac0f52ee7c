"""Dataset loading with host-side parallel prefetch.

Replaces reference DatasetLoader (dataset.py:153-208).  The reference fans
out over ``multiprocessing.Pool(12)``; here a thread pool is used instead —
PIL/scipy release the GIL during decode/resize, threads share memory with
the JAX host process, and no pickling of page arrays is needed.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, List, Optional

from ..core.colors import ColorMap
from ..core.image_io import imread, imread_bin
from .dataset import Dataset, SingleData, read_dataset_json
from .prepare import prepare_images, prepare_mask


class DatasetLoader:
    def __init__(
        self,
        target_line_height: int,
        color_map: ColorMap,
        prediction: bool = False,
        max_width: Optional[int] = None,
        resize_backend: str = "scipy",
        num_workers: int = 12,
    ):
        self.target_line_height = target_line_height
        self.prediction = prediction
        self.color_map = color_map
        self.max_width = max_width
        self.resize_backend = resize_backend
        self.num_workers = num_workers

    def load_images(self, entry: SingleData) -> SingleData:
        img = entry.image if entry.image is not None else imread(entry.image_path, as_gray=True)
        original_shape = img.shape
        if entry.binary is not None:
            binary = entry.binary
        elif entry.binary_path is not None:
            binary = imread_bin(entry.binary_path, True)
        else:
            # like the reference (dataset.py:172), fall back to the image itself
            binary = imread_bin(entry.image_path, True)

        img, binary, orig_bin = prepare_images(
            img,
            binary,
            self.target_line_height,
            entry.line_height_px,
            self.max_width,
            keep_orig_bin=True,
            resize_backend=self.resize_backend,
        )

        if not self.prediction:
            mask = entry.mask if entry.mask is not None else self.color_map.imread_labels(entry.mask_path)
            mask = prepare_mask(mask, img.shape)
            assert mask.shape == img.shape
            entry.mask = mask

        entry.binary = binary
        entry.orig_binary = orig_bin
        entry.image = img
        entry.original_shape = original_shape
        return entry

    def load_data(self, entries: Iterable[SingleData]) -> Dataset:
        entries = list(entries)
        if self.num_workers <= 1 or len(entries) <= 1:
            out = [self.load_images(e) for e in entries]
        else:
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                out = list(pool.map(self.load_images, entries))
        return Dataset(out, self.color_map)

    def load_data_from_json(self, files: List[str], split_type: str) -> Dataset:
        entries = read_dataset_json(files, split_type)
        return self.load_data(entries)
