"""Dataset model, directory walking, and split utilities.

Capability parity with reference dataset.py: ``SingleData``/``Dataset``
(:17-41), ``list_dataset`` (:44-111), ``single_split`` (:247-276),
``create_splits`` (:279-289), dataset-JSON parsing (:200-208, schema in
reference README.md:46-108).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from random import shuffle
from typing import Any, List, Optional, Tuple

import numpy as np

from ..core.colors import ColorMap
from ..core.image_io import random_indices


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
    # lazy (streaming) entries: pixels stay on disk; the prepared shape is
    # peeked from the PNG header so training can bucket without loading,
    # and ``loader`` materializes a copy at batch-build time
    prepared_shape: Optional[Tuple[int, int]] = None
    loader: Any = None


@dataclass
class Dataset:
    data: List[SingleData]
    color_map: ColorMap

    def __len__(self) -> int:
        return len(self.data)

    def __iter__(self):
        return iter(self.data)


def entry_shape(d: SingleData) -> Tuple[int, int]:
    """Prepared (H, W) of an entry — loaded pixels, or the header-peeked
    shape of a lazy (streaming) entry."""
    if d.image is not None:
        return tuple(d.image.shape[:2])
    if d.prepared_shape is not None:
        return tuple(d.prepared_shape)
    raise ValueError("dataset entry has neither pixels nor a prepared_shape")


_io_pool = None


def io_pool():
    """Shared thread pool for page decode/IO fan-out (PIL releases the
    GIL): one pool for the whole process instead of a spawn/teardown per
    batch on the streaming hot path.

    Sized to the host: 8 threads on a 1-core machine measured 3x SLOWER
    than serial decode (157 vs 52 ms/page at 300-DPI A4 — context-switch
    thrash between GIL-holding numpy sections), so the width is
    min(cores, 8) with a floor of one."""
    global _io_pool
    if _io_pool is None:
        import os
        from concurrent.futures import ThreadPoolExecutor

        width = max(1, min(8, os.cpu_count() or 1))
        _io_pool = ThreadPoolExecutor(max_workers=width, thread_name_prefix="ps-io")
    return _io_pool


def materialize(samples: List[SingleData]) -> List[SingleData]:
    """Load any lazy (streaming) entries into shallow copies — the copies
    (and their pixels) drop after use, the sources stay path-only, so
    callers hold O(batch) pages in memory, not O(corpus)."""
    if not any(d.image is None and d.loader is not None for d in samples):
        return samples

    def load(d):
        return d.loader.load_lazy(d) if d.image is None and d.loader is not None else d

    if len(samples) == 1:
        return [load(samples[0])]
    return list(io_pool().map(load, samples))


def _stem(path: str) -> str:
    """Filename up to the first dot — the page id that ties the three
    directories (binary/images/masks) together."""
    return os.path.basename(path).split(".")[0]


def _scan_dir(directory: str, keep=None) -> List[str]:
    """Sorted full paths of a directory's files, optionally filtered."""
    if not os.path.exists(directory):
        raise Exception(f"Dataset dir does not exist at '{directory}'")
    names = sorted(os.listdir(directory))
    if keep is not None:
        names = [n for n in names if keep(n)]
    return [os.path.join(directory, n) for n in names]


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
    """Walk a dataset directory into file-entry dicts.

    Contract of reference dataset.py:44-111: three sibling directories of
    equal-length sorted file lists (binary / image / color mask, the mask
    recognized by ``masks_postfix``), plus either a fixed ``line_height_px``
    or per-page ``{"char_height": N}`` JSONs under ``normalizations/``.
    With ``verify_filenames`` pages are joined on the filename stem and
    unmatched files dropped; unlike the reference the join here is
    deterministic (stem-sorted) and the normalization files are matched
    per-stem rather than positionally.
    """
    if not os.path.exists(root_dir):
        raise Exception(f"Dataset dir does not exist at '{root_dir}'")

    columns = {
        "binary_path": _scan_dir(os.path.join(root_dir, binary_dir_)),
        "image_path": _scan_dir(
            os.path.join(root_dir, images_dir_),
            keep=(lambda n: not n.endswith(masks_postfix)) if masks_postfix else None,
        ),
        "mask_path": _scan_dir(
            os.path.join(root_dir, masks_dir_),
            keep=(lambda n: n.endswith(masks_postfix)) if masks_postfix else None,
        ),
    }

    if verify_filenames:
        # join on stems; masks may carry the postfix after the stem's dot
        def keyed(paths, strip_postfix=""):
            out = {}
            for p in paths:
                body = p[: -len(strip_postfix)] if strip_postfix and p.endswith(strip_postfix) else p
                out[_stem(body)] = p
            return out

        maps = {
            col: keyed(paths, masks_postfix if col == "mask_path" else "")
            for col, paths in columns.items()
        }
        shared = sorted(set.intersection(*(set(m) for m in maps.values())))
        columns = {col: [m[s] for s in shared] for col, m in maps.items()}

    lengths = {col: len(paths) for col, paths in columns.items()}
    if len(set(lengths.values())) != 1:
        raise Exception(
            "Mismatch in dataset files length: %d, %d, %d!"
            % (lengths["binary_path"], lengths["image_path"], lengths["mask_path"])
        )
    n_pages = lengths["mask_path"]

    if line_height_px:
        heights = [line_height_px] * n_pages
    else:
        norm_dir = os.path.join(root_dir, normalizations_dir)
        if not os.path.exists(norm_dir):
            raise Exception(f"Norm dir does not exist at '{norm_dir}'")

        def char_height_of(path):
            with open(path, "r") as f:
                return json.load(f)["char_height"]

        norm_files = _scan_dir(norm_dir)
        if verify_filenames:
            # match per joined page stem (pages the join dropped must not
            # contribute normalization files)
            by_stem = {_stem(p): p for p in norm_files}
            joined = [_stem(b) for b in columns["binary_path"]]
            missing = [s for s in joined if s not in by_stem]
            if missing:
                raise Exception(f"No normalization files for pages: {missing}")
            norm_files = [by_stem[s] for s in joined]
        heights = [char_height_of(p) for p in norm_files]
        if len(heights) != n_pages:
            raise Exception(
                f"{len(heights)} normalization files for {n_pages} pages in {norm_dir}"
            )

    return [
        {"binary_path": b, "image_path": i, "mask_path": m, "line_height_px": h}
        for b, i, m, h in zip(
            columns["binary_path"], columns["image_path"], columns["mask_path"], heights
        )
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


def _resolve_split_sizes(requests: dict, total: int) -> dict:
    """Turn per-split size requests into absolute counts.

    Each request is an absolute count, a fraction in (0, 1) of ``total``,
    or negative meaning "all files not claimed by the others" (at most one
    split may ask for the remainder).  Raises if the resolved counts
    exceed ``total``.
    """
    counts = {
        name: int(req * total) if 0 < req < 1 else int(req)
        for name, req in requests.items()
    }
    remainder_splits = [name for name, c in counts.items() if c < 0]
    if len(remainder_splits) > 1:
        raise Exception("At most one split may claim the remaining files")
    if remainder_splits:
        claimed = sum(c for c in counts.values() if c >= 0)
        counts[remainder_splits[0]] = total - claimed
    if sum(counts.values()) > total:
        detail = " + ".join(f"{name}={c}" for name, c in counts.items())
        raise Exception(
            f"Split sizes exceed the dataset: {detail} "
            f"sums to {sum(counts.values())} but only {total} files exist"
        )
    return counts


def single_split(n_train, n_test, n_eval, data_files):
    """Random three-way split with fraction/absolute/remainder sizes.

    Capability of reference dataset.py:247-276; returns
    ``(train, test, eval)`` lists drawn without replacement.
    """
    counts = _resolve_split_sizes(
        {"eval": n_eval, "train": n_train, "test": n_test}, len(data_files)
    )
    order = iter(random_indices(data_files))
    drawn = {
        name: [data_files[next(order)] for _ in range(counts[name])]
        for name in ("eval", "train", "test")
    }
    return drawn["train"], drawn["test"], drawn["eval"]


def create_splits(data_files: List[str], num_splits: int):
    """k-fold cross-validation splits: yields ``(rest, fold)`` per fold.

    Capability of reference dataset.py:279-289.  Folds partition a
    shuffled copy of the file list; every file appears in exactly one
    held-out fold.
    """
    pool = data_files.copy()
    shuffle(pool)
    fold_indices = np.array_split(np.arange(len(pool)), num_splits)
    for held_out in fold_indices:
        keep = set(held_out.tolist())
        fold = [pool[i] for i in held_out]
        rest = [f for i, f in enumerate(pool) if i not in keep]
        yield rest, fold
