"""The pipelined segmentation driver must write byte-identical outputs to
the per-page host chain, for RGB and indexed prediction PNGs, host and
device morphology backends (reference pc_segmentation.py semantics
throughout)."""
import os

import numpy as np
import pytest

from page_segmentation_tpu.core.colors import ColorMap
from page_segmentation_tpu.core.image_io import (
    imread_labels,
    imread_rgb,
    imsave,
    imsave_indexed,
)
from page_segmentation_tpu.segmentation.batch import PageSegmenter
from page_segmentation_tpu.segmentation.pc_segmentation import (
    find_segments,
    find_segments_indexed,
    get_text_contours,
)
from page_segmentation_tpu.segmentation.render import (
    render_morphological,
    render_regions,
    render_xycut,
)

CMAP = ColorMap({"(255, 255, 255)": (0, "background"),
                 "(255, 0, 0)": (1, "text"),
                 "(0, 255, 0)": (2, "image")})
PALETTE = CMAP.palette


def _make_page(rng, h=120, w=90):
    labels = np.zeros((h, w), np.uint8)
    for r in range(10, h - 20, 18):  # text lines
        labels[r : r + 5, 8 : w - 8] = 1
    labels[h - 25 : h - 8, 12 : w // 2] = 2  # an image block
    ys, xs = rng.randint(0, h, 12), rng.randint(0, w, 12)
    labels[ys, xs] = 1  # speckle
    return labels


@pytest.fixture()
def pages(tmp_path):
    rng = np.random.RandomState(3)
    out = []
    for i in range(5):
        labels = _make_page(rng)
        rgb_path = str(tmp_path / f"p{i}.rgb.pred.png")
        idx_path = str(tmp_path / f"p{i}.idx.pred.png")
        imsave(rgb_path, PALETTE[labels])
        imsave_indexed(idx_path, labels, PALETTE)
        out.append((labels, rgb_path, idx_path))
    return out


def test_imread_labels_roundtrip(pages):
    labels, rgb_path, idx_path = pages[0]
    got = imread_labels(idx_path)
    assert got is not None
    got_labels, got_palette = got
    assert np.array_equal(got_labels, labels)
    assert np.array_equal(got_palette[: len(PALETTE)], PALETTE)
    # RGB sources return None (callers fall back to imread_rgb)
    assert imread_labels(rgb_path) is None
    # and the decoded RGB pixels agree between the two encodings
    assert np.array_equal(imread_rgb(rgb_path), PALETTE[labels])


def test_find_segments_indexed_equals_rgb(pages):
    for labels, _, _ in pages:
        rgb = PALETTE[labels]
        for ch in (4, 6):
            for only_images in (False, True):
                a = find_segments(rgb.shape[0], rgb, ch, 60, CMAP,
                                  only_images=only_images)
                b = find_segments_indexed(labels.shape[0], labels, PALETTE,
                                          ch, 60, CMAP,
                                          only_images=only_images)
                assert a == b


def _reference_outputs(pages, out_dir, text_contours, ch=5):
    """The per-page host chain (the pre-pipeline CLI semantics)."""
    os.makedirs(out_dir, exist_ok=True)
    for _, rgb_path, _ in pages:
        image = imread_rgb(rgb_path)
        texts, images = find_segments(image.shape[0], image, ch, 60, CMAP,
                                      only_images=text_contours)
        if text_contours:
            regions, method = get_text_contours(image, ch, CMAP), render_morphological
        else:
            regions, method = texts, render_xycut
        render_regions(out_dir, "png", image.shape[:2], rgb_path, CMAP,
                       method, regions, images)


@pytest.mark.parametrize("text_contours", [False, True])
@pytest.mark.parametrize("source", ["rgb", "idx"])
@pytest.mark.parametrize("backend", ["host", "device"])
def test_pipeline_outputs_equal_per_page(tmp_path, pages, text_contours,
                                         source, backend):
    if backend == "device" and not text_contours:
        pytest.skip("device backend only affects the text-contours chain")
    ref_dir = str(tmp_path / "ref")
    _reference_outputs(pages, ref_dir, text_contours)
    got_dir = str(tmp_path / f"got_{source}_{backend}")
    seg = PageSegmenter(CMAP, 60, text_contours, got_dir, backend=backend,
                        batch_size=2)
    path_idx = 1 if source == "rgb" else 2
    results = list(seg.run((p[path_idx], 5) for p in pages))
    assert len(results) == len(pages)
    for i in range(len(pages)):
        ref = imread_rgb(os.path.join(ref_dir, f"p{i}.rgb.pred.png"))
        got_name = (f"p{i}.rgb.pred.png" if source == "rgb"
                    else f"p{i}.idx.pred.png")
        got = imread_rgb(os.path.join(got_dir, got_name))
        assert np.array_equal(ref, got), f"page {i}"


def test_pipeline_xml_output(tmp_path, pages):
    xml_dir = str(tmp_path / "xml")
    seg = PageSegmenter(CMAP, 60, True, str(tmp_path / "o"),
                        xml_output_dir=xml_dir, backend="host")
    list(seg.run([(pages[0][2], 5)]))
    files = os.listdir(xml_dir)
    assert len(files) == 1 and files[0].endswith(".xml")


def test_pipeline_mixed_shapes_one_batch(tmp_path):
    """Pages of different shapes share a batch: same-shape runs group into
    one device dispatch each, outputs still equal the host chain."""
    rng = np.random.RandomState(4)
    paths = []
    shapes = [(120, 90), (120, 90), (100, 80)]
    for i, (h, w) in enumerate(shapes):
        labels = _make_page(rng, h, w)
        p = str(tmp_path / f"m{i}.pred.png")
        imsave_indexed(p, labels, PALETTE)
        paths.append(p)
    host_dir, dev_dir = str(tmp_path / "h"), str(tmp_path / "d")
    for d, backend in ((host_dir, "host"), (dev_dir, "device")):
        seg = PageSegmenter(CMAP, 60, True, d, backend=backend, batch_size=4)
        assert len(list(seg.run((p, 5) for p in paths))) == 3
    for i in range(3):
        a = imread_rgb(os.path.join(host_dir, f"m{i}.pred.png"))
        b = imread_rgb(os.path.join(dev_dir, f"m{i}.pred.png"))
        assert np.array_equal(a, b)
