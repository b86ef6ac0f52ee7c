"""Data-parallel ThroughputPredictor over a device mesh == single device.

BASELINE throughput config: "1k-page corpus, on-device
connected-components + overlay, data-parallel across chips".  The fused
predict program shards over the mesh's data axis with shard_map; every
stage is per-page independent, so mesh results must equal the
single-device path exactly — including ragged batches (padded with zero
pages, cropped on download) and the fused cc-vote.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
from page_segmentation_tpu.inference.pipeline import ThroughputPredictor
from page_segmentation_tpu.models.fcn import FCNSkip
from page_segmentation_tpu.parallel.mesh import make_mesh


def _build(mesh, download, cc_vote, h, w):
    module = FCNSkip(n_classes=3)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    return ThroughputPredictor(
        module, params, DEFAULT_IMAGE_MAP.palette, (h, w), 6 / 50,
        host_decimate=8, compute_dtype=jnp.float32, download=download,
        cc_vote=cc_vote, mesh=mesh,
    )


@pytest.mark.parametrize(
    "download,cc_vote",
    # cc_vote crossed with every download mode: the vote path runs under
    # shard_map(check_vma=False) (pipeline.py), so its correctness on a
    # mesh must be pinned for each download layout, not just "pred"
    [("packed", False), ("color", False),
     ("pred", True), ("packed", True), ("color", True)],
)
def test_mesh_matches_single_device(download, cc_vote):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(4)
    rng = np.random.RandomState(0)
    h, w = 400, 296
    n = 6  # ragged vs the 4-device mesh: exercises zero-page padding
    pages = rng.randint(0, 255, (n, h, w)).astype(np.uint8)
    binaries = np.where(pages < 128, 0, 255).astype(np.uint8)

    single = _build(None, download, cc_vote, h, w)
    parallel = _build(mesh, download, cc_vote, h, w)

    got_s = list(single.run(pages, binaries, batch_size=n))[0]
    got_m = list(parallel.run(pages, binaries, batch_size=n))[0]
    for a, b in zip(got_s, got_m):
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("cc_vote", [False, True])
def test_staged_api_matches_run(cc_vote):
    """prep_batch/prep_pages + execute_batch (the serving engine's staged
    entry points) must produce exactly what one run() iteration yields —
    including the per-page prep path's zero-pixel/no-ink pad slots."""
    rng = np.random.RandomState(3)
    h, w = 400, 296
    n = 3
    pages = rng.randint(0, 255, (n, h, w)).astype(np.uint8)
    binaries = np.where(pages < 128, 0, 255).astype(np.uint8)

    tp = _build(None, "pred", cc_vote, h, w)
    via_run = list(tp.run(pages, binaries, batch_size=4))[0]

    pad = np.concatenate([pages, np.zeros((1, h, w), np.uint8)])
    bin_pad = np.concatenate([binaries, np.full((1, h, w), 255, np.uint8)])
    via_batch = tp.execute_batch(tp.prep_batch(pad, bin_pad))
    via_pages = tp.execute_batch(
        tp.prep_pages(list(pages), list(binaries), 4))
    for got in (via_batch, via_pages):
        for a, b in zip(via_run, got):
            np.testing.assert_array_equal(a, b[: a.shape[0]])
