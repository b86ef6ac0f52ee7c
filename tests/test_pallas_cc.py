"""Pallas CC kernel (interpret mode on CPU) vs host union-find oracle."""
import numpy as np
import pytest

from page_segmentation_tpu.ops.cc import connected_components_with_stats
from page_segmentation_tpu.ops.pallas_cc import cc_min_label_pallas, cc_vote_pallas


def _oracle_min_labels(ink):
    """min-flat-index component ids via the host CC."""
    _, labels, _, _ = connected_components_with_stats(ink, connectivity=4)
    h, w = ink.shape
    flat = np.arange(h * w).reshape(h, w) + 1
    out = np.zeros((h, w), np.int32)
    for component in range(1, labels.max() + 1):
        member = labels == component
        out[member] = flat[member].min()
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_min_labels_match_oracle(seed):
    rng = np.random.RandomState(seed)
    ink = (rng.rand(24, 32) > 0.55).astype(np.uint8)
    labels, sweeps = cc_min_label_pallas(ink, interpret=True)
    np.testing.assert_array_equal(np.asarray(labels), _oracle_min_labels(ink))
    assert int(sweeps) > 0


def test_snake_component():
    """A serpentine component needs many sweeps; must still converge."""
    ink = np.zeros((16, 16), np.uint8)
    for row in range(0, 16, 2):
        ink[row, :] = 1
        if (row // 2) % 2 == 0 and row + 1 < 16:
            ink[row + 1, -1] = 1
        elif row + 1 < 16:
            ink[row + 1, 0] = 1
    labels, sweeps = cc_min_label_pallas(ink, interpret=True)
    got = np.asarray(labels)
    assert (got[ink != 0] == 1).all()  # single component rooted at flat 0+1


def test_vote_matches_host():
    from page_segmentation_tpu.data.dataset import SingleData
    from page_segmentation_tpu.inference.postprocess import vote_connected_component_class

    rng = np.random.RandomState(2)
    binary = (rng.rand(20, 28) > 0.6).astype(np.uint8)
    pred = rng.randint(0, 3, (20, 28)).astype(np.int32)
    host = vote_connected_component_class(pred, SingleData(binary=binary))
    dev = np.asarray(cc_vote_pallas(pred, binary, 3, interpret=True))
    np.testing.assert_array_equal(dev, host)


def test_empty_ink():
    ink = np.zeros((8, 16), np.uint8)
    labels, _ = cc_min_label_pallas(ink, interpret=True)
    np.testing.assert_array_equal(np.asarray(labels), 0)


def test_tiled_multiband_matches_oracle():
    """Band-tiled CC (+XLA pointer jump) on a page spanning many bands."""
    from page_segmentation_tpu.ops.pallas_cc import cc_min_label_tiled

    rng = np.random.RandomState(3)
    ink = (rng.rand(96, 64) > 0.55).astype(np.uint8)
    labels, iters = cc_min_label_tiled(ink, band=16, inner_iters=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(labels), _oracle_min_labels(ink))
    assert int(iters) < 16  # pointer jumping keeps rounds logarithmic


def test_tiled_spiral_adversarial():
    """A spiral component winding through every band: geodesic diameter in
    the thousands, must converge in a handful of outer rounds."""
    from page_segmentation_tpu.ops.pallas_cc import cc_min_label_tiled

    spiral = np.zeros((64, 64), np.uint8)
    top, bottom, left, right = 0, 63, 0, 63
    while top < bottom and left < right:
        spiral[top, left : right + 1] = 1
        spiral[top : bottom + 1, right] = 1
        spiral[bottom, left : right + 1] = 1
        spiral[top : bottom + 1, left] = 1
        top += 4; bottom -= 4; left += 4; right -= 4
    labels, iters = cc_min_label_tiled(spiral, band=16, inner_iters=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(labels), _oracle_min_labels(spiral))
    assert int(iters) <= 8


def test_dispatch_band_fits_vmem():
    from page_segmentation_tpu.ops.pallas_cc import _fit_band

    for w in (304, 2480, 4096, 8192):
        band = _fit_band(w)
        assert band >= 8 and band % 8 == 0
        assert (band + 2) * w <= 260_000 or band == 8


def test_unaligned_height_tiled():
    """Heights not divisible by the band are padded internally."""
    from page_segmentation_tpu.ops.pallas_cc import cc_min_label_tiled

    rng = np.random.RandomState(4)
    ink = (rng.rand(50, 40) > 0.5).astype(np.uint8)
    labels, _ = cc_min_label_tiled(ink, band=16, inner_iters=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(labels), _oracle_min_labels(ink))
