"""Third-party-oracle gates for the re-owned preprocessing chain.

The reimplementations in ops/resize.py, ops/morphology.py,
ops/contours.py, ops/threshold.py, ops/cc.py, data/prepare.py and
evaluation/image_ops.py were originally derived from the reference's
formulas (reference dataset.py:114-150, pc_segmentation.py:63-116,
image_ops.py:58-82) because the build image shipped neither skimage nor
cv2.  ``tools/gen_preprocessing_oracles.py`` freezes real-library
inputs/outputs into ``tests/oracles/``; this module consumes them so the
parity gates run everywhere, without the libraries.

Status: the cv2-backed families (morphology, contours, otsu, cc4,
resize_nearest_cv, char_height) were generated against REAL cv2 5.0 on
the round-3 build host (see also tests/test_cv2_parity_live.py for the
randomized live gates).  The skimage-backed families (rescale/resize
order-0/3, prepare_images) skip with a pointer until skimage is
installable — partial generations merge.
"""
import hashlib
import json
import os

import numpy as np
import pytest

ORACLE_DIR = os.path.join(os.path.dirname(__file__), "oracles")
NPZ = os.path.join(ORACLE_DIR, "preprocessing_oracles.npz")
MANIFEST = os.path.join(ORACLE_DIR, "manifest.json")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(NPZ) and os.path.exists(MANIFEST)),
    reason="third-party oracles not generated yet — run "
    "tools/gen_preprocessing_oracles.py on a machine with skimage+cv2 "
    "and check tests/oracles/ in",
)


@pytest.fixture(scope="module")
def oracles():
    data = np.load(NPZ)
    with open(MANIFEST) as f:
        manifest = json.load(f)
    # integrity: every stored array must hash to the manifest's record
    for key, expected in manifest["array_sha256"].items():
        digest = hashlib.sha256(np.ascontiguousarray(data[key]).tobytes()).hexdigest()
        assert digest == expected, f"oracle array {key} corrupted"
    return data, manifest["cases"]


def _cases(cases, prefix):
    """Case names under a family prefix; skip (don't vacuously pass) when
    the family's backing library wasn't available at generation time."""
    found = sorted(name for name in cases if name.startswith(prefix))
    if not found:
        pytest.skip(
            f"no '{prefix}' oracle cases generated yet — re-run "
            "tools/gen_preprocessing_oracles.py where the backing library "
            "is installed (partial generations merge)"
        )
    return found


def test_rescale_nearest(oracles):
    from page_segmentation_tpu.ops.resize import rescale_nearest

    data, cases = oracles
    for name in _cases(cases, "rescale_nearest/"):
        got = rescale_nearest(data[f"{name}/x"], float(data[f"{name}/scale"]))
        np.testing.assert_array_equal(got, data[f"{name}/y"], err_msg=name)


def test_resize_cubic(oracles):
    from page_segmentation_tpu.ops.resize import resize_cubic

    data, cases = oracles
    for name in _cases(cases, "resize_cubic/"):
        got = resize_cubic(
            data[f"{name}/x"].astype(np.float64),
            tuple(data[f"{name}/target"]),
            anti_aliasing=bool(data[f"{name}/anti"]),
        )
        np.testing.assert_allclose(
            got, data[f"{name}/y"], atol=cases[name]["tolerance"], err_msg=name
        )


def test_resize_nearest_labels(oracles):
    from page_segmentation_tpu.ops.resize import resize_nearest

    data, cases = oracles
    [name] = _cases(cases, "resize_nearest/")
    got = resize_nearest(data[f"{name}/x"], tuple(data[f"{name}/target"]))
    np.testing.assert_array_equal(got.astype(np.uint8), data[f"{name}/y"])


def test_resize_nearest_cv(oracles):
    # cv2 INTER_NEAREST convention (reference pc_segmentation.py:31)
    from page_segmentation_tpu.ops.resize import resize_nearest_cv

    data, cases = oracles
    for name in _cases(cases, "resize_nearest_cv/"):
        got = resize_nearest_cv(data[f"{name}/x"], tuple(data[f"{name}/target"]))
        np.testing.assert_array_equal(got, data[f"{name}/y"], err_msg=name)


def test_otsu(oracles):
    from page_segmentation_tpu.ops.threshold import otsu_binarize, otsu_threshold

    data, cases = oracles
    for name in _cases(cases, "otsu/"):
        x = data[f"{name}/x"]
        assert otsu_threshold(x) == int(data[f"{name}/t"]), name
        # invert=True == plain cv2 THRESH_BINARY output (no 255-subtract)
        np.testing.assert_array_equal(
            otsu_binarize(x, invert=True), data[f"{name}/y"], err_msg=name
        )


def test_cc4_with_stats(oracles):
    from page_segmentation_tpu.ops.cc import connected_components_with_stats

    data, cases = oracles
    for name in _cases(cases, "cc4/"):
        got = connected_components_with_stats(data[f"{name}/x"], 4)
        assert got.num_labels == int(data[f"{name}/n"]), name
        np.testing.assert_array_equal(got.labels, data[f"{name}/labels"])
        np.testing.assert_array_equal(got.stats, data[f"{name}/stats"])
        np.testing.assert_allclose(got.centroids, data[f"{name}/centroids"])


def test_prepare_images(oracles):
    from page_segmentation_tpu.data.prepare import prepare_images

    data, cases = oracles
    for name in _cases(cases, "prepare_images/"):
        kwargs = {}
        if f"{name}/max_width" in data:
            kwargs["max_width"] = int(data[f"{name}/max_width"])
        img, bin_ = prepare_images(
            data[f"{name}/image"],
            data[f"{name}/binary"],
            int(data[f"{name}/tlh"]),
            int(data[f"{name}/lh"]),
            **kwargs,
        )
        np.testing.assert_array_equal(img, data[f"{name}/img"], err_msg=name)
        np.testing.assert_array_equal(bin_, data[f"{name}/bin"], err_msg=name)


@pytest.mark.parametrize("op", ["dilate", "close", "open"])
def test_morphology(oracles, op):
    from page_segmentation_tpu.ops import morphology

    fn = {
        "dilate": morphology.dilate,
        "close": morphology.morph_close,
        "open": morphology.morph_open,
    }[op]
    data, cases = oracles
    for name in _cases(cases, f"{op}/"):
        got = fn(data[f"{name}/x"], tuple(int(v) for v in data[f"{name}/k"]))
        np.testing.assert_array_equal(got, data[f"{name}/y"], err_msg=name)


def test_filled_external_contours(oracles):
    from page_segmentation_tpu.ops.contours import fill_contour, find_external_contours

    data, _ = oracles
    name = "contours/filled_external"
    x = data[f"{name}/x"]
    filled = np.zeros_like(x)
    for contour in find_external_contours(x):
        fill_contour(filled, contour, 255)
    np.testing.assert_array_equal(filled, data[f"{name}/y"])


def test_char_height(oracles):
    from page_segmentation_tpu.evaluation.image_ops import compute_char_height_arr

    data, cases = oracles
    for name in _cases(cases, "char_height/"):
        got = compute_char_height_arr(data[f"{name}/image"], inverse=False)
        expected = int(data[f"{name}/h"])
        if expected == -1:
            assert got is None, name
        else:
            assert got == expected, name
