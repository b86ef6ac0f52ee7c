"""Split utilities + dataset directory walker (reference dataset.py:44-111,
247-289 capability)."""
import json
import os
import random

import pytest

from page_segmentation_tpu.data.dataset import (
    create_splits,
    list_dataset,
    single_split,
)


FILES = [f"page_{i:02d}" for i in range(10)]


class TestSingleSplit:
    def test_absolute_counts(self):
        train, test, eval_ = single_split(6, 2, 2, FILES)
        assert (len(train), len(test), len(eval_)) == (6, 2, 2)
        assert sorted(train + test + eval_) == sorted(FILES)

    def test_fractions(self):
        train, test, eval_ = single_split(0.5, 0.3, 0.2, FILES)
        assert (len(train), len(test), len(eval_)) == (5, 3, 2)

    def test_remainder(self):
        train, test, eval_ = single_split(-1, 2, 2, FILES)
        assert len(train) == 6
        assert sorted(train + test + eval_) == sorted(FILES)

    def test_two_remainders_rejected(self):
        with pytest.raises(Exception, match="remaining"):
            single_split(-1, -1, 2, FILES)

    def test_oversubscribed_rejected(self):
        with pytest.raises(Exception):
            single_split(8, 8, 8, FILES)

    def test_no_overlap_and_random(self):
        random.seed(0)
        train, test, eval_ = single_split(4, 3, 3, FILES)
        assert not (set(train) & set(test)) and not (set(train) & set(eval_))


class TestCreateSplits:
    def test_kfold_partition(self):
        random.seed(1)
        folds = list(create_splits(FILES, 3))
        assert len(folds) == 3
        held = [f for _, fold in folds for f in fold]
        assert sorted(held) == sorted(FILES)  # each file held out exactly once
        for rest, fold in folds:
            assert sorted(rest + fold) == sorted(FILES)
            assert not (set(rest) & set(fold))


class TestListDataset:
    @pytest.fixture()
    def root(self, tmp_path):
        for sub in ("binary_images", "images", "masks", "normalizations"):
            (tmp_path / sub).mkdir()
        for i in range(3):
            (tmp_path / "binary_images" / f"p{i}.png").touch()
            (tmp_path / "images" / f"p{i}.png").touch()
            (tmp_path / "masks" / f"p{i}.png").touch()
            (tmp_path / "normalizations" / f"p{i}.json").write_text(
                json.dumps({"char_height": 20 + i})
            )
        return tmp_path

    def test_fixed_line_height(self, root):
        entries = list_dataset(str(root), line_height_px=32)
        assert len(entries) == 3
        assert all(e["line_height_px"] == 32 for e in entries)
        assert all(os.path.exists(os.path.dirname(e["mask_path"])) for e in entries)

    def test_per_page_normalizations(self, root):
        entries = list_dataset(str(root))
        assert [e["line_height_px"] for e in entries] == [20, 21, 22]

    def test_verify_filenames_drops_unmatched(self, root):
        (root / "images" / "extra.png").touch()
        with pytest.raises(Exception, match="Mismatch"):
            list_dataset(str(root), line_height_px=32)
        entries = list_dataset(str(root), line_height_px=32, verify_filenames=True)
        assert len(entries) == 3

    def test_masks_postfix(self, root, tmp_path):
        for i in range(3):
            old = root / "masks" / f"p{i}.png"
            old.rename(root / "masks" / f"p{i}_GT.png")
        entries = list_dataset(str(root), line_height_px=32, masks_postfix="_GT.png")
        assert all(e["mask_path"].endswith("_GT.png") for e in entries)

    def test_missing_dir(self, tmp_path):
        with pytest.raises(Exception, match="does not exist"):
            list_dataset(str(tmp_path / "nope"), line_height_px=32)
