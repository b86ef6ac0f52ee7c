"""Dry-run the one-command corpus ingest (tools/ingest_corpus.py) against
the golden corpus: PAGE-XML + scans in, a trainable dataset layout +
split JSON out — the staging path for a real historical-scan drop
(reference examples/dataset-creation-example.sh recipe, one command)."""
import json
import os
import sys

import numpy as np
import pytest

CORPUS = os.path.join(os.path.dirname(__file__), "golden_corpus")


@pytest.fixture()
def ingest(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import ingest_corpus

    return ingest_corpus


def test_ingest_with_provided_binaries(ingest, tmp_path):
    out = str(tmp_path / "ds")
    rc = ingest.main([
        "--images", os.path.join(CORPUS, "images"),
        "--xml", os.path.join(CORPUS, "xml"),
        "--binary", os.path.join(CORPUS, "binary"),
        "--output", out,
        "--setting", "text_nontext",
        "--n-train", "-1", "--n-test", "1", "--n-eval", "2",
        "--seed", "3",
    ])
    assert rc == 0
    for sub in ("images", "binary_images", "masks", "normalizations"):
        assert os.listdir(os.path.join(out, sub)), sub
    assert os.path.exists(os.path.join(out, "image_map.json"))
    split = json.load(open(os.path.join(out, "dataset.json")))
    n = len(os.listdir(os.path.join(CORPUS, "images")))
    assert len(split["test"]) == 1 and len(split["eval"]) == 2
    assert len(split["train"]) == n - 3
    # entries load through the real training loader
    from page_segmentation_tpu.core.colors import ColorMap
    from page_segmentation_tpu.data.loader import DatasetLoader

    cmap = ColorMap.load(os.path.join(out, "image_map.json"))
    loader = DatasetLoader(6, cmap)
    loaded = loader.load_data_from_json(
        [os.path.join(out, "dataset.json")], "train")
    entry = loaded.data[0]
    assert entry.image is not None and entry.mask is not None
    assert entry.image.shape == entry.mask.shape


def test_ingest_otsu_binarizes_when_no_binary_dir(ingest, tmp_path):
    out = str(tmp_path / "ds")
    rc = ingest.main([
        "--images", os.path.join(CORPUS, "images"),
        "--xml", os.path.join(CORPUS, "xml"),
        "--output", out,
        "--setting", "text_nontext",
        "--n-train", "-1",
        "--seed", "3",
    ])
    assert rc == 0
    from page_segmentation_tpu.core.image_io import imread_bilevel_packed

    bins = sorted(os.listdir(os.path.join(out, "binary_images")))
    assert bins
    # binaries came out as true bilevel fast-layout PNGs
    got = imread_bilevel_packed(os.path.join(out, "binary_images", bins[0]))
    assert got is not None
