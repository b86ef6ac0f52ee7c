"""Batched on-device cc-majority vote (fused fast path) vs host parity.

The ROADMAP item this closes: the per-page device vote was link-bound
(~6 ms/page over the tunneled chip); `cc_vote_batch` votes a whole batch in
the same dispatch as the forward pass, with the ink mask uploaded 1-bit
packed.  Host `vote_connected_component_class` (reference postprocess.py:9-26
semantics) is the exactness oracle.
"""
import numpy as np

from page_segmentation_tpu.data.dataset import SingleData
from page_segmentation_tpu.inference.postprocess import vote_connected_component_class
from page_segmentation_tpu.ops.pallas_cc import cc_vote_batch


def test_cc_vote_batch_matches_host():
    rng = np.random.RandomState(0)
    preds = rng.randint(0, 3, (3, 24, 32)).astype(np.int32)
    inks = (rng.rand(3, 24, 32) > 0.6).astype(np.uint8)
    got = np.asarray(cc_vote_batch(preds, inks, n_classes=3, interpret=True))
    for i in range(3):
        want = vote_connected_component_class(preds[i], SingleData(binary=inks[i]))
        np.testing.assert_array_equal(got[i], want)


def test_cc_vote_batch_xla_matches_host():
    """The pure-XLA vote (no Pallas — keeps pipeline overlap) is exact."""
    from page_segmentation_tpu.ops.pallas_cc import cc_vote_batch_xla

    rng = np.random.RandomState(5)
    preds = rng.randint(0, 3, (3, 24, 32)).astype(np.int32)
    inks = (rng.rand(3, 24, 32) > 0.6).astype(np.uint8)
    got = np.asarray(cc_vote_batch_xla(preds, inks, n_classes=3))
    for i in range(3):
        want = vote_connected_component_class(preds[i], SingleData(binary=inks[i]))
        np.testing.assert_array_equal(got[i], want)


def test_cc_vote_batch_xla_snake_component():
    """A serpentine component exercises many scan-cycle turns; the batch
    while_loop must converge it jointly with an already-trivial page."""
    from page_segmentation_tpu.ops.pallas_cc import cc_vote_batch_xla

    h, w = 24, 32
    snake = np.zeros((h, w), np.uint8)
    for r in range(0, h, 4):
        snake[r] = 1
        if (r // 4) % 2 == 0 and r + 4 <= h:
            snake[r:r + 5, w - 1] = 1
        elif r + 4 <= h:
            snake[r:r + 5, 0] = 1
    pred = np.zeros((h, w), np.int32)
    pred[h // 2:] = 2  # majority decides the whole snake
    preds = np.stack([pred, np.zeros((h, w), np.int32)])
    inks = np.stack([snake, np.zeros((h, w), np.uint8)])
    got = np.asarray(cc_vote_batch_xla(preds, inks, n_classes=3))
    want = vote_connected_component_class(preds[0], SingleData(binary=inks[0]))
    np.testing.assert_array_equal(got[0], want)


def test_cc_vote_batch_empty_and_full_ink():
    preds = np.stack([np.zeros((16, 16), np.int32), np.ones((16, 16), np.int32)])
    inks = np.stack([np.zeros((16, 16), np.uint8), np.ones((16, 16), np.uint8)])
    got = np.asarray(cc_vote_batch(preds, inks, n_classes=3, interpret=True))
    np.testing.assert_array_equal(got[0], preds[0])  # no ink: unchanged
    np.testing.assert_array_equal(got[1], preds[1])  # one component, all class 1


def test_pack_unpack_bits_roundtrip():
    from page_segmentation_tpu.inference.output import pack_bits_host, unpack_bits_device

    rng = np.random.RandomState(1)
    mask = rng.rand(2, 16, 40) > 0.5
    packed = pack_bits_host(mask)
    assert packed.shape == (2, 16, 5)
    np.testing.assert_array_equal(np.asarray(unpack_bits_device(packed)), mask)


def test_predict_batch_masks_device_vote_parity():
    from page_segmentation_tpu.inference.classifier import PixelClassifier

    classifier = PixelClassifier(n_classes=3)
    rng = np.random.RandomState(2)
    images = rng.randint(0, 256, (2, 32, 40)).astype(np.uint8)  # W%8==0: packed ink
    binaries = (rng.rand(2, 32, 40) > 0.5).astype(np.uint8)
    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], np.uint8)

    pred_plain, _ = classifier.predict_batch_masks(images, binaries, palette)
    pred_voted, masks = classifier.predict_batch_masks(
        images, binaries, palette, device_vote=True
    )
    for i in range(2):
        want = vote_connected_component_class(
            pred_plain[i].astype(np.int32), SingleData(binary=binaries[i])
        )
        np.testing.assert_array_equal(pred_voted[i], want.astype(np.uint8))
    # mask trio is built from the voted class map
    color = masks[0]
    np.testing.assert_array_equal(color[0], palette[np.minimum(pred_voted[0], 2)])


def test_fast_path_device_vote_matches_host_chain():
    """predict_dataset_fast with device_post_process on == host cc-vote chain."""
    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.data.dataset import Dataset
    from page_segmentation_tpu.inference.classifier import PixelClassifier
    from page_segmentation_tpu.inference.predictor import Predictor, PredictSettings

    rng = np.random.RandomState(3)
    pages = [
        SingleData(
            image=rng.randint(0, 256, (32, 40)).astype(np.uint8),
            binary=(rng.rand(32, 40) > 0.5).astype(np.uint8),
            output_path=f"p{i}.png",
        )
        for i in range(3)
    ]
    dataset = Dataset(pages, DEFAULT_IMAGE_MAP)
    classifier = PixelClassifier(n_classes=3)

    def run(device_flag):
        settings = PredictSettings(
            n_classes=3,
            color_map=DEFAULT_IMAGE_MAP,
            post_process=[vote_connected_component_class],
            device_post_process=device_flag,
        )
        return list(
            Predictor(settings, network=classifier).predict_dataset_fast(
                dataset, batch_size=2
            )
        )

    host = run(False)
    dev = run(True)
    assert len(host) == len(dev) == 3
    for (_, hp, hc, ho, hi), (_, dp, dc, do, di) in zip(host, dev):
        np.testing.assert_array_equal(np.asarray(hp), np.asarray(dp))
        np.testing.assert_array_equal(hc, dc)
        np.testing.assert_array_equal(ho, do)
        np.testing.assert_array_equal(hi, di)


def test_throughput_pipeline_device_cc_vote():
    """ThroughputPredictor(cc_vote=True): the fused dispatch's voted class
    map equals host cc-vote applied to the unvoted class map, and run()
    yields the trio built from the voted labels."""
    import jax
    import jax.numpy as jnp

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.output import pack_bits_host, unpack_classes
    from page_segmentation_tpu.inference.pipeline import ThroughputPredictor
    from page_segmentation_tpu.models.fcn import FCNSkip

    module = FCNSkip(n_classes=3)
    rng = np.random.RandomState(4)
    h, w = 400, 296
    pages = rng.randint(0, 255, (2, h, w)).astype(np.uint8)
    binaries = np.where(pages < 128, 0, 255).astype(np.uint8)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]

    def build(cc):
        return ThroughputPredictor(
            module, params, DEFAULT_IMAGE_MAP.palette, (h, w), 6 / 50,
            host_decimate=8, compute_dtype=jnp.float32, download="pred",
            cc_vote=cc,
        )

    plain, voted = build(False), build("xla")  # the fused DEVICE vote
    dec_dev, ink = plain._prep(pages, binaries)
    pad_h, pad_w = plain.fused.padded_shape
    ink_padded = np.zeros((2, pad_h, pad_w), bool)
    ink_padded[:, : ink.shape[1], : ink.shape[2]] = ink

    pred = np.asarray(plain.fused(plain.variables, dec_dev, plain.palette_dev))
    got = np.asarray(
        voted.fused(
            voted.variables, dec_dev, voted.palette_dev,
            jax.device_put(pack_bits_host(ink_padded)),
        )
    )
    for i in range(2):
        want = vote_connected_component_class(
            pred[i].astype(np.int32), SingleData(binary=ink_padded[i].astype(np.uint8))
        )
        np.testing.assert_array_equal(got[i], want.astype(np.uint8))

    # run() end to end: trio equals the trio of the voted labels
    trio = list(voted.run(pages, binaries, batch_size=2))[0]
    out_h, out_w = voted.fused.valid_shape
    palette = np.asarray(DEFAULT_IMAGE_MAP.palette, np.uint8)
    exp_color = palette[np.minimum(got[:, :out_h, :out_w], 2)]
    np.testing.assert_array_equal(trio[0], exp_color)



def test_throughput_pipeline_host_cc_vote_matches_device():
    """cc_vote='host' (native C vote inside the overlapped finish stage)
    yields the identical trio to the device 'xla' vote — same pages, same
    labels, different placement."""
    import jax
    import jax.numpy as jnp

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.pipeline import ThroughputPredictor
    from page_segmentation_tpu.models.fcn import FCNSkip

    module = FCNSkip(n_classes=3)
    rng = np.random.RandomState(5)
    h, w = 400, 296
    pages = rng.randint(0, 255, (4, h, w)).astype(np.uint8)
    binaries = np.where(pages < 128, 0, 255).astype(np.uint8)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]

    def trios(cc, download):
        p = ThroughputPredictor(
            module, params, DEFAULT_IMAGE_MAP.palette, (h, w), 6 / 50,
            host_decimate=8, compute_dtype=jnp.float32, download=download,
            cc_vote=cc,
        )
        return [tuple(np.array(a) for a in t)
                for t in p.run(pages, binaries, batch_size=2)]

    device = trios("xla", "pred")
    host_packed = trios("host", "packed")
    host_color = trios("host", "color")  # auto-switches to a class download
    for a, b, c in zip(device, host_packed, host_color):
        for x, y, z in zip(a, b, c):
            np.testing.assert_array_equal(x, y)
            np.testing.assert_array_equal(x, z)


def test_packed_download_rejects_many_classes():
    """download='packed' is 2-bit; >4-class models are refused up front
    (and the host vote's color->packed auto-switch falls back to 'pred')."""
    import jax
    import jax.numpy as jnp
    import pytest

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.pipeline import ThroughputPredictor
    from page_segmentation_tpu.models.fcn import FCNSkip

    module = FCNSkip(n_classes=6)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    palette = np.zeros((6, 3), np.uint8)
    with pytest.raises(ValueError, match="packed"):
        ThroughputPredictor(module, params, palette, (400, 296), 6 / 50,
                            compute_dtype=jnp.float32, download="packed")
    p = ThroughputPredictor(module, params, palette, (400, 296), 6 / 50,
                            compute_dtype=jnp.float32, download="color",
                            cc_vote="host")
    assert p.download == "pred"


def test_native_vote_finish_packed_matches_python_chain():
    """The one-call native vote finish (unpack + per-component majority
    vote + trio) must equal the Python chain it replaces: unpack_classes
    -> reference-semantics vote -> finish_mask_trio."""
    import jax.numpy as jnp
    import pytest

    from page_segmentation_tpu import native
    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.output import (
        finish_mask_trio,
        pack_classes_device,
        unpack_classes,
    )

    if not native.available() or native.get_lib() is None or \
            not hasattr(native.get_lib(), "ps_vote_finish_packed"):
        pytest.skip("native library without ps_vote_finish_packed")

    palette = DEFAULT_IMAGE_MAP.palette
    rng = np.random.RandomState(3)
    for h, w, pad_w in [(17, 24, 24), (33, 40, 48)]:  # incl. padded packed rows
        n = 3
        pred = rng.randint(0, 3, (n, h, pad_w)).astype(np.int32)
        ink = (rng.rand(n, h, w) > 0.55)
        packed = np.asarray(pack_classes_device(jnp.asarray(pred)))

        got = native.vote_finish_packed(packed, ink.astype(np.uint8), palette, 3)
        assert got is not None

        unpacked = unpack_classes(packed)[:, :h, :w]
        voted = np.stack([
            vote_connected_component_class(
                unpacked[i].astype(np.int64), SingleData(binary=ink[i].astype(np.uint8))
            )
            for i in range(n)
        ]).astype(np.uint8)
        want = finish_mask_trio(voted, ink, palette)
        for g, w_ in zip(got, want):
            np.testing.assert_array_equal(g, w_)
