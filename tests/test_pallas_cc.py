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
