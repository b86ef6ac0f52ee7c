"""Dataset model, directory walking, and split utilities.

Capability parity with reference dataset.py: ``SingleData``/``Dataset``
(:17-41), ``list_dataset`` (:44-111), ``single_split`` (:247-276),
``create_splits`` (:279-289), dataset-JSON parsing (:200-208, schema in
reference README.md:46-108).
"""
from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from random import shuffle
from typing import Any, List, Optional, Tuple

import numpy as np

from ..core.colors import ColorMap
from ..core.image_io import chunks, random_indices


@dataclass
class SingleData:
    """One page: image + binarized image + (for training) label mask."""

    image: Optional[np.ndarray] = None
    binary: Optional[np.ndarray] = None
    orig_binary: Optional[np.ndarray] = None
    mask: Optional[np.ndarray] = None
    image_path: Optional[str] = None
    binary_path: Optional[str] = None
    mask_path: Optional[str] = None
    line_height_px: Optional[int] = 1
    original_shape: Optional[Tuple[int, int]] = None
    output_path: Optional[str] = None
    user_data: Any = None


@dataclass
class Dataset:
    data: List[SingleData]
    color_map: ColorMap

    def __len__(self) -> int:
        return len(self.data)

    def __iter__(self):
        return iter(self.data)


def list_dataset(
    root_dir: str,
    line_height_px: Optional[int] = None,
    binary_dir_: str = "binary_images",
    images_dir_: str = "images",
    masks_dir_: str = "masks",
    masks_postfix: str = "",
    normalizations_dir: str = "normalizations",
    verify_filenames: bool = False,
) -> List[dict]:
    """Walk a dataset directory into file-entry dicts
    (reference dataset.py:44-111 contract, incl. per-page char_height JSONs)."""

    def listdir(directory, postfix="", not_postfix=False):
        names = sorted(os.listdir(directory))
        if postfix and not_postfix:
            names = [n for n in names if not n.endswith(postfix)]
        elif postfix:
            names = [n for n in names if n.endswith(postfix)]
        return [os.path.join(directory, n) for n in names]

    def extract_char_height(path):
        with open(path, "r") as f:
            return json.load(f)["char_height"]

    binary_dir = os.path.join(root_dir, binary_dir_)
    images_dir = os.path.join(root_dir, images_dir_)
    masks_dir = os.path.join(root_dir, masks_dir_)
    for d in (root_dir, binary_dir, images_dir, masks_dir):
        if not os.path.exists(d):
            raise Exception(f"Dataset dir does not exist at '{d}'")

    binaries = listdir(binary_dir)
    images = listdir(images_dir, masks_postfix, not_postfix=True)
    masks = listdir(masks_dir, masks_postfix)

    base_names = None
    if verify_filenames:

        def by_basename(paths, postfix=None):
            if postfix:
                trimmed = [p[: -len(postfix)] if p.endswith(postfix) else p for p in paths]
                return {os.path.basename(p).split(".")[0]: p + postfix for p in trimmed}
            return {os.path.basename(p).split(".")[0]: p for p in paths}

        bin_map = by_basename(binaries)
        img_map = by_basename(images)
        mask_map = by_basename(masks, masks_postfix)
        base_names = set(bin_map) & set(img_map) & set(mask_map)
        binaries = [bin_map[b] for b in base_names]
        images = [img_map[b] for b in base_names]
        masks = [mask_map[b] for b in base_names]

    if not line_height_px:
        norm_dir = os.path.join(root_dir, normalizations_dir)
        if not os.path.exists(norm_dir):
            raise Exception(f"Norm dir does not exist at '{norm_dir}'")
        norm_files = listdir(norm_dir)
        if verify_filenames:
            norm_files = [
                p for p in norm_files if any(os.path.basename(p).startswith(b) for b in base_names)
            ]
        line_heights = [extract_char_height(p) for p in norm_files]
        assert len(line_heights) == len(masks)
    else:
        line_heights = [line_height_px] * len(masks)

    if not (len(binaries) == len(images) == len(masks)):
        raise Exception(
            "Mismatch in dataset files length: %d, %d, %d!" % (len(binaries), len(images), len(masks))
        )

    return [
        {"binary_path": b, "image_path": i, "mask_path": m, "line_height_px": lh}
        for b, i, m, lh in zip(binaries, images, masks, line_heights)
    ]


def read_dataset_json(files, split_type: str) -> List[SingleData]:
    """Parse dataset JSON files (reference dataset.py:200-208)."""
    entries: List[SingleData] = []
    for path in files:
        with open(path, "r") as f:
            content = json.load(f)
        if split_type == "all":
            for t in ("train", "test", "eval"):
                entries += [SingleData(**d) for d in content.get(t, [])]
        else:
            entries += [SingleData(**d) for d in content[split_type]]
    return entries


def single_split(n_train, n_test, n_eval, data_files):
    """Fraction-or-absolute three-way split (reference dataset.py:247-276)."""

    def fraction_or_absolute(part, collection):
        if 0 < part < 1:
            return int(part * len(collection))
        return int(part)

    n_eval = fraction_or_absolute(n_eval, data_files)
    n_test = fraction_or_absolute(n_test, data_files)
    n_train = fraction_or_absolute(n_train, data_files)
    if sum([n_eval < 0, n_train < 0, n_test < 0]) > 1:
        raise Exception("Only one dataset may get all remaining files")
    if n_eval < 0:
        n_eval = len(data_files) - n_train - n_test
    elif n_train < 0:
        n_train = len(data_files) - n_eval - n_test
    elif n_test < 0:
        n_test = len(data_files) - n_eval - n_train
    if len(data_files) < n_eval + n_train + n_test:
        raise Exception(
            f"The dataset consists of {len(data_files)} files, "
            f"but eval + train + test = {n_eval} + {n_train} + {n_test} = {n_eval + n_train + n_test}"
        )
    indices = random_indices(data_files)
    eval_files = [data_files[d] for d in indices[:n_eval]]
    train_files = [data_files[d] for d in indices[n_eval : n_eval + n_train]]
    test_files = [data_files[d] for d in indices[n_eval + n_train : n_eval + n_train + n_test]]
    return train_files, test_files, eval_files


def create_splits(data_files: List[str], num_splits: int):
    """n-fold split generator (reference dataset.py:279-289)."""
    pool = data_files.copy()
    shuffle(pool)
    parts = list(chunks(pool, math.ceil(len(pool) / num_splits)))
    for i in range(num_splits):
        split: List[str] = []
        for c in range(len(parts)):
            if c != i:
                split += parts[c]
        yield split, parts[i]
