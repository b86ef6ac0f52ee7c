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
        binarize: str = "threshold",
    ):
        self.target_line_height = target_line_height
        self.prediction = prediction
        self.color_map = color_map
        self.max_width = max_width
        self.resize_backend = resize_backend
        self.num_workers = num_workers
        if binarize not in ("threshold", "otsu"):
            raise ValueError(f"binarize must be 'threshold' or 'otsu', got {binarize!r}")
        # how pages WITHOUT a separate binarized file are binarized:
        # 'threshold' = global 128 (imread_bin; reference dataset.py:172),
        # 'otsu' = per-page Otsu (cv2 convention)
        self.binarize = binarize

    def load_images(self, entry: SingleData) -> SingleData:
        img = entry.image if entry.image is not None else imread(entry.image_path, as_gray=True)
        original_shape = img.shape
        if entry.binary is not None:
            binary = entry.binary
        elif entry.binary_path is not None:
            binary = imread_bin(entry.binary_path, True)
        elif self.binarize == "otsu":
            from ..ops.threshold import otsu_binarize

            binary = otsu_binarize(img, invert=True)
        else:
            # like the reference (dataset.py:172), fall back to the image
            # itself — thresholded in memory (byte-equal to
            # imread_bin(image_path), without a second PNG decode of the
            # file just decoded into ``img``)
            import numpy as np

            binary = np.where(img >= 128, np.uint8(255), np.uint8(0))

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

    def peek_prepared_shape(self, entry: SingleData):
        """The shape ``load_images`` would produce, from the PNG header
        alone (PIL opens lazily — no pixel decode)."""
        from PIL import Image

        from .prepare import prepared_shape

        path = entry.binary_path or entry.image_path
        with Image.open(path) as im:
            w, h = im.size
        return prepared_shape((h, w), self.target_line_height, entry.line_height_px, self.max_width)

    def load_lazy(self, entry: SingleData) -> SingleData:
        """Materialize a lazy entry into a shallow copy: the source entry
        keeps only paths, so a streaming epoch holds O(batch) pages in
        memory, not O(corpus)."""
        import copy

        fresh = copy.copy(entry)
        fresh.loader = None
        return self.load_images(fresh)

    def load_data(self, entries: Iterable[SingleData], lazy: bool = False) -> Dataset:
        """Eager (default): load every page into memory in parallel, the
        reference's Pool(12) behavior (dataset.py:193-198).  ``lazy``:
        keep pixels on disk — entries carry their prepared shape (peeked
        from the PNG header) and a loader back-reference; the Trainer
        materializes batch-sized copies in its prefetch thread."""
        entries = list(entries)
        if lazy:
            pathless = [e for e in entries if e.image is None and e.image_path is None]
            if pathless:
                raise ValueError(
                    "lazy loading needs image_path on every entry "
                    f"({len(pathless)} in-memory entries given)"
                )
            for e in entries:
                if e.image is None:
                    e.prepared_shape = self.peek_prepared_shape(e)
                    e.loader = self
            return Dataset(entries, self.color_map)
        if self.num_workers <= 1 or len(entries) <= 1:
            out = [self.load_images(e) for e in entries]
        else:
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                out = list(pool.map(self.load_images, entries))
        return Dataset(out, self.color_map)

    def load_data_from_json(self, files: List[str], split_type: str, lazy: bool = False) -> Dataset:
        entries = read_dataset_json(files, split_type)
        return self.load_data(entries, lazy=lazy)
