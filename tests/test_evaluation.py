import numpy as np
import pytest

from page_segmentation_tpu.evaluation.image_ops import (
    compute_char_height_arr,
    fgoverlap_per_class,
    fgpa,
)
from page_segmentation_tpu.evaluation.metrics import (
    ConnectedComponentEval,
    cc_equal,
    cc_matching,
    count_matches,
    f1_measures,
    total_accuracy,
)


def test_count_matches_reference_semantics():
    mask = np.array([[1, 1], [0, 0]])
    pred = np.array([[1, 0], [1, 0]])
    tp, fp, fn = count_matches(mask, pred, 1)
    assert tp == 1
    assert fp == 1  # mask==1, pred!=1 (reference's swapped fp)
    assert fn == 1  # mask!=1, pred==1


def test_total_accuracy():
    mask = np.array([[1, 1], [0, 0]])
    pred = np.array([[1, 0], [0, 0]])
    correct, total = total_accuracy(mask, pred)
    assert correct == 3 and total == 4


def test_f1_measures():
    precision, recall, f1 = f1_measures(10, 5, 5)
    assert precision == recall == f1 == 10 / 15
    assert f1_measures(0, 3, 3) == (0.0, 0.0, 0.0)


def test_cc_equal():
    fn = cc_equal(0.5)
    assert fn(np.array([1, 1, 0]), np.array([1, 1, 1]))
    assert not fn(np.array([0, 0, 1]), np.array([1, 1, 0]))


def test_cc_matching():
    match = cc_matching(1, threshold_tp=0.5, threshold_fp=0.25)
    mask = np.array([1, 1, 1, 0])
    pred = np.array([1, 1, 0, 0])
    np.testing.assert_array_equal(match(mask, pred), [1, 0, 0])  # TP
    np.testing.assert_array_equal(match(np.zeros(4), pred), [0, 1, 0])  # FP
    np.testing.assert_array_equal(match(mask, np.zeros(4)), [0, 0, 1])  # FN


def test_connected_component_eval():
    binary = np.zeros((10, 10), np.uint8)
    binary[1:4, 1:4] = 1
    binary[6:9, 6:9] = 1
    mask = np.ones((10, 10), np.int32)
    pred = np.ones((10, 10), np.int32)
    pred[6:9, 6:9] = 0  # second component mispredicted

    cce = ConnectedComponentEval(mask, pred, binary)
    results = list(cce.run_per_component(lambda m, p: np.count_nonzero(m == p) / np.size(m)))
    assert len(results) == 2
    assert results[0] == 1.0 and results[1] == 0.0


def test_connected_component_eval_filter():
    binary = np.zeros((10, 10), np.uint8)
    binary[1:4, 1:4] = 1
    binary[6:9, 6:9] = 1
    mask = np.zeros((10, 10), np.int32)
    mask[1:4, 1:4] = 2  # only first component has label 2
    pred = np.zeros((10, 10), np.int32)

    cce = ConnectedComponentEval(mask, pred, binary).only_label(2, 0.5)
    results = list(cce.run_per_component(lambda m, p: 1))
    assert len(results) == 1


def test_fgpa():
    pred = np.array([[1, 1], [0, 1]])
    mask = np.array([[1, 0], [0, 1]])
    binary = np.array([[1, 1], [0, 0]])
    # 2 fg pixels, 1 mismatch among them
    assert fgpa(pred, mask, binary) == 0.5


def test_fgoverlap_per_class():
    pred = np.array([[0, 1], [1, 1]])
    mask = np.array([[0, 1], [0, 1]])
    binary = np.ones((2, 2), np.int64)
    overlaps, tps, fps, fns = fgoverlap_per_class(pred, mask, binary, n_classes=2)
    assert len(overlaps) == 3
    # with all-foreground binary, index i is label i directly (the +1/-1
    # shift only remaps background pixels to -1)
    assert tps[1] == 2 and fps[1] == 1 and fns[1] == 0
    np.testing.assert_allclose(overlaps[1], 2 / 3)


def test_compute_char_height():
    img = np.full((200, 200), 255, np.uint8)
    rng = np.random.RandomState(0)
    # draw letter-like dark blobs ~20px tall, ~12px wide
    for row in range(10, 180, 40):
        for col in range(10, 180, 25):
            img[row : row + 20, col : col + 12] = 0
    ch = compute_char_height_arr(img, inverse=False)
    assert ch == 20


def test_compute_char_height_no_letters():
    img = np.full((50, 50), 255, np.uint8)
    assert compute_char_height_arr(img, inverse=False) is None


def test_compute_char_height_file(tmp_path):
    from page_segmentation_tpu.core.image_io import imsave
    from page_segmentation_tpu.evaluation.image_ops import compute_char_height

    img = np.full((100, 100), 255, np.uint8)
    for col in range(10, 90, 25):
        img[30:50, col : col + 12] = 0
    imsave(tmp_path / "page.png", img)
    assert compute_char_height(str(tmp_path / "page.png"), inverse=False) == 20
    with pytest.raises(Exception, match="does not exist"):
        compute_char_height(str(tmp_path / "missing.png"), inverse=False)


def test_fgoverlap_out_of_range_labels():
    """Stale labels beyond n_classes count as mismatches (fn for the
    expected class) instead of crashing (reference scans ignored them)."""
    pred = np.array([[5, 1], [1, 1]])  # label 5 out of range for n_classes=2
    mask = np.array([[1, 1], [1, 1]])
    binary = np.ones((2, 2), np.int64)
    overlaps, tps, fps, fns = fgoverlap_per_class(pred, mask, binary, n_classes=2)
    assert tps[1] == 3 and fns[1] == 1 and fps[1] == 0
    # negative labels are out-of-range too, not background
    pred2 = np.array([[-1, 1], [1, 1]])
    _, tps2, _, fns2 = fgoverlap_per_class(pred2, mask, binary, n_classes=2)
    assert tps2[1] == 3 and fns2[1] == 1
