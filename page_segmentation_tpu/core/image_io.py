"""Image / file IO helpers.

Rebuild of the ``ocr4all.files`` helpers the reference imports
(reference dataset.py:14: ``imread``, ``imread_bin``, ``random_indices``,
``chunks``; reference render.py:8: ``split_filename``), built on PIL only —
the environment has no cv2/skimage.
"""
from __future__ import annotations

import os
from random import shuffle
from typing import Iterable, List, Sequence, Tuple

import numpy as np
from PIL import Image

# Large historical scans can exceed PIL's decompression-bomb default.
Image.MAX_IMAGE_PIXELS = None


def imread(path, as_gray: bool = False) -> np.ndarray:
    """Read an image as uint8; grayscale (H, W) when ``as_gray``."""
    with Image.open(path) as im:
        if as_gray:
            if im.mode not in ("L", "I;16", "I"):
                im = im.convert("L")
            arr = np.asarray(im)
            if arr.dtype != np.uint8:
                # scale by the dtype range, not the per-image max: the same
                # physical intensity must map to the same uint8 value on
                # every page (content-dependent scaling breaks the fixed
                # binarization threshold downstream)
                if arr.dtype == np.uint16:
                    arr = (arr // 257).astype(np.uint8)
                else:  # 32-bit 'I' mode and friends
                    arr = np.clip(arr.astype(np.float64) / 257.0, 0, 255).astype(np.uint8)
            return arr
        return np.asarray(im.convert("RGB"))


def imread_rgb(path) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def imread_bin(path, binarize: bool = True, threshold: int = 128) -> np.ndarray:
    """Read a binarized image as 0/255 uint8 (white background, black ink)."""
    gray = imread(path, as_gray=True)
    if not binarize:
        return gray
    return np.where(gray >= threshold, np.uint8(255), np.uint8(0))


def imsave(path, image: np.ndarray) -> None:
    image = np.asarray(image)
    if image.dtype == bool:
        image = image.astype(np.uint8) * 255
    elif image.dtype != np.uint8:
        image = np.clip(image, 0, 255).astype(np.uint8)
    Image.fromarray(image).save(path)


def split_filename(path) -> Tuple[str, str, str]:
    """Split a path into (directory, basename-without-extension, extension)."""
    directory, name = os.path.split(str(path))
    base, ext = os.path.splitext(name)
    return directory, base, ext.lstrip(".")


def random_indices(collection: Sequence) -> List[int]:
    indices = list(range(len(collection)))
    shuffle(indices)
    return indices


def chunks(items: Sequence, n: int) -> Iterable[Sequence]:
    """Yield successive n-sized chunks."""
    for i in range(0, len(items), n):
        yield items[i : i + n]


def glob_all(patterns: Iterable[str]) -> List[str]:
    """Expand a list of shell glob patterns into a sorted file list."""
    import glob as _glob

    out: List[str] = []
    for pattern in patterns:
        matched = sorted(_glob.glob(pattern))
        out.extend(matched if matched else [pattern])
    return out
