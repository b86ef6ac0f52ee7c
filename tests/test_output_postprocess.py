import numpy as np
import pytest

from page_segmentation_tpu.core.colors import ColorMap
from page_segmentation_tpu.data.dataset import SingleData
from page_segmentation_tpu.inference.output import (
    generate_output_masks,
    masks_on_device,
    scale_to_original_shape,
)
from page_segmentation_tpu.inference.postprocess import (
    add_bounding_boxes,
    cc_vote_on_device,
    find_postprocessor,
    vote_connected_component_class,
)


@pytest.fixture
def cmap():
    return ColorMap(
        {
            "(255, 255, 255)": (0, "background"),
            "(255, 0, 0)": (1, "text"),
            "(0, 255, 0)": (2, "image"),
        }
    )


def test_generate_output_masks_semantics(cmap):
    pred = np.array([[0, 1], [2, 1]])
    binary = np.array([[0, 1], [1, 0]], np.uint8)  # 1 = ink
    data = SingleData(binary=binary)
    masks = generate_output_masks(data, pred, cmap)
    np.testing.assert_array_equal(masks.color[0, 1], [255, 0, 0])
    # overlay: zeroed where binary==1 (reference output.py:46-49 behavior)
    np.testing.assert_array_equal(masks.overlay[0, 1], [0, 0, 0])
    np.testing.assert_array_equal(masks.overlay[0, 0], [255, 255, 255])
    # inverted: zeroed where binary==0
    np.testing.assert_array_equal(masks.inverted_overlay[0, 0], [0, 0, 0])
    np.testing.assert_array_equal(masks.inverted_overlay[0, 1], [255, 0, 0])
    # fg_color_mask equals inverted (both keep ink pixels)
    np.testing.assert_array_equal(masks.fg_color_mask, masks.inverted_overlay)


def test_masks_on_device_matches_host(cmap):
    rng = np.random.RandomState(0)
    logits = rng.randn(6, 7, 3).astype(np.float32)
    binary = (rng.rand(6, 7) > 0.5).astype(np.uint8)
    pred_d, color_d, overlay_d, inverted_d = masks_on_device(logits, binary, cmap.palette)
    pred = logits.argmax(-1)
    host = generate_output_masks(SingleData(binary=binary), pred, cmap)
    np.testing.assert_array_equal(np.asarray(pred_d), pred)
    np.testing.assert_array_equal(np.asarray(color_d), host.color)
    np.testing.assert_array_equal(np.asarray(overlay_d), host.overlay)
    np.testing.assert_array_equal(np.asarray(inverted_d), host.inverted_overlay)


def test_all_mask_products_host_equals_device_property(cmap):
    """Single gate over every mask product in every mode: the host trio
    (generate_output_masks — the reference bit-parity surface,
    output.py:44-60), the fused device products (masks_on_device), the
    production finish path (finish_mask_trio, native + numpy fallback),
    the 2-bit packed wire format, and the high-res path must all agree on
    random inputs.  fg_color_mask equals inverted_overlay for 0/1
    binaries (semantics pinned in test_generate_output_masks_semantics),
    so inverted equality covers the fourth product."""
    import jax.numpy as jnp

    from page_segmentation_tpu.inference.output import (
        finish_mask_trio,
        pack_classes_device,
        unpack_classes,
    )
    from page_segmentation_tpu.ops.resize import resize_nearest

    rng = np.random.RandomState(7)
    for h, w in [(6, 8), (13, 16), (21, 24)]:  # w % 4 == 0 for the packed mode
        n = 3
        logits = rng.randn(n, h, w, 3).astype(np.float32)
        binary = (rng.rand(n, h, w) > 0.5).astype(np.uint8)
        pred = logits.argmax(-1)
        host = [
            generate_output_masks(SingleData(binary=binary[i]), pred[i], cmap)
            for i in range(n)
        ]

        # fused device products
        pred_d, color_d, overlay_d, inverted_d = masks_on_device(
            logits, binary, cmap.palette
        )
        for i in range(n):
            np.testing.assert_array_equal(np.asarray(pred_d)[i], pred[i])
            np.testing.assert_array_equal(np.asarray(color_d)[i], host[i].color)
            np.testing.assert_array_equal(np.asarray(overlay_d)[i], host[i].overlay)
            np.testing.assert_array_equal(
                np.asarray(inverted_d)[i], host[i].inverted_overlay
            )
            np.testing.assert_array_equal(
                host[i].fg_color_mask, host[i].inverted_overlay
            )

        # production finish path (native kernel or numpy fallback)
        color, overlay, inverted = finish_mask_trio(
            pred.astype(np.uint8), binary.astype(bool), cmap.palette
        )
        for i in range(n):
            np.testing.assert_array_equal(color[i], host[i].color)
            np.testing.assert_array_equal(overlay[i], host[i].overlay)
            np.testing.assert_array_equal(inverted[i], host[i].inverted_overlay)

        # 2-bit packed wire format roundtrips into the same trio
        unpacked = unpack_classes(np.asarray(pack_classes_device(jnp.asarray(pred))))
        np.testing.assert_array_equal(unpacked, pred.astype(np.uint8))
        color_p, overlay_p, inverted_p = finish_mask_trio(
            unpacked, binary.astype(bool), cmap.palette
        )
        for i in range(n):
            np.testing.assert_array_equal(color_p[i], host[i].color)
            np.testing.assert_array_equal(overlay_p[i], host[i].overlay)
            np.testing.assert_array_equal(inverted_p[i], host[i].inverted_overlay)

        # high-res mode: order-0 upscale + orig binary through both paths
        orig_shape = (h * 2 + 1, w * 2)
        for i in range(n):
            data = SingleData(
                image=np.zeros((h, w), np.uint8),
                binary=binary[i],
                orig_binary=(rng.rand(*orig_shape) > 0.5).astype(np.uint8),
                original_shape=orig_shape,
            )
            hi_data, hi_pred = scale_to_original_shape(data, pred[i])
            hi_host = generate_output_masks(hi_data, hi_pred, cmap)
            hi_trio = finish_mask_trio(
                resize_nearest(pred[i], orig_shape).astype(np.uint8)[None],
                np.asarray(hi_data.binary, bool)[None],
                cmap.palette,
            )
            np.testing.assert_array_equal(hi_trio[0][0], hi_host.color)
            np.testing.assert_array_equal(hi_trio[1][0], hi_host.overlay)
            np.testing.assert_array_equal(hi_trio[2][0], hi_host.inverted_overlay)


def test_scale_to_original_shape():
    data = SingleData(
        image=np.zeros((4, 4), np.uint8),
        binary=np.ones((4, 4), np.uint8),
        orig_binary=np.ones((8, 8), np.uint8),
        original_shape=(8, 8),
    )
    pred = np.arange(16).reshape(4, 4) % 3
    new_data, new_pred = scale_to_original_shape(data, pred)
    assert new_pred.shape == (8, 8)
    assert new_pred.dtype == np.int64
    assert new_data.binary.shape == (8, 8)
    assert new_data.image.shape == (8, 8)


def _reference_cc_vote(pred, binary):
    """Direct transliteration of the reference loop for oracle testing."""
    from page_segmentation_tpu.ops.cc import connected_components_with_stats

    pred = pred.copy()
    num_labels, labels, stats, _ = connected_components_with_stats(binary, connectivity=4)
    for i in range(1, num_labels):
        left, top, w, h = stats[i, 0], stats[i, 1], stats[i, 2], stats[i, 3]
        pred_slice = pred[top : top + h, left : left + w]
        mask = labels[top : top + h, left : left + w] == i
        prebin = np.reshape((pred_slice + 1) * mask, pred_slice.size)
        bins = np.bincount(prebin)
        maxclass = np.argmax(bins[1:])
        pred[top : top + h, left : left + w] = pred_slice - mask * pred_slice + mask * maxclass
    return pred


def test_cc_vote_matches_reference_loop():
    rng = np.random.RandomState(0)
    binary = (rng.rand(40, 30) > 0.6).astype(np.uint8)
    pred = rng.randint(0, 3, (40, 30))
    data = SingleData(binary=binary)
    expected = _reference_cc_vote(pred, binary)
    got = vote_connected_component_class(pred, data)
    np.testing.assert_array_equal(got, expected)


def test_cc_vote_on_device_matches_host():
    rng = np.random.RandomState(1)
    binary = (rng.rand(24, 32) > 0.6).astype(np.uint8)
    pred = rng.randint(0, 3, (24, 32)).astype(np.int32)
    host = vote_connected_component_class(pred, SingleData(binary=binary))
    dev = np.asarray(cc_vote_on_device(pred, binary, n_classes=3))
    np.testing.assert_array_equal(dev, host)


def test_add_bounding_boxes():
    pred = np.zeros((6, 6), np.int64)
    pred[1:3, 1:3] = 1
    pred[2, 2] = 1
    pred[4, 4] = 2
    out = add_bounding_boxes(pred, SingleData())
    assert (out[1:3, 1:3] == 1).all()
    assert out[4, 4] == 2
    assert out[0, 0] == 0


def test_find_postprocessor_aliases():
    assert find_postprocessor("cc_majority") is vote_connected_component_class
    assert find_postprocessor("CC-Vote") is vote_connected_component_class
    assert find_postprocessor("bbox") is add_bounding_boxes


def test_fast_path_applies_postprocessors(tmp_path):
    """predict_dataset_fast with a post_process chain: voted labels, mask
    trio rebuilt from the final label map."""
    from page_segmentation_tpu.core.colors import ColorMap
    from page_segmentation_tpu.data.dataset import Dataset, SingleData
    from page_segmentation_tpu.inference.postprocess import (
        find_postprocessor,
        vote_connected_component_class,
    )
    from page_segmentation_tpu.inference.predictor import Predictor, PredictSettings

    cmap = ColorMap({"(255, 255, 255)": (0, "background"), "(255, 0, 0)": (1, "text"),
                     "(0, 255, 0)": (2, "image")})
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (48, 40)).astype(np.uint8)
    binary = np.zeros((48, 40), np.uint8)
    binary[10:30, 10:30] = 1  # one ink component
    data = SingleData(image=image, binary=binary)
    dataset = Dataset([data], cmap)

    from page_segmentation_tpu.inference.classifier import PixelClassifier

    net = PixelClassifier(n_classes=3)
    settings = PredictSettings(output=str(tmp_path), color_map=cmap, n_classes=3,
                               post_process=[find_postprocessor("cc_vote")])
    predictor = Predictor(settings, network=net)
    d, pred, color, overlay, inverted = next(predictor.predict_dataset_fast(dataset))

    # the voted labels inside the component are uniform
    component = pred[10:30, 10:30]
    assert len(np.unique(component)) == 1
    # and match running the postprocessor on the unvoted fast-path output
    plain = next(Predictor(PredictSettings(output=str(tmp_path / "plain"), color_map=cmap,
                                           n_classes=3),
                           network=predictor.network).predict_dataset_fast(dataset))[1]
    np.testing.assert_array_equal(pred, vote_connected_component_class(plain, d))
    # mask trio is consistent with the voted labels
    np.testing.assert_array_equal(color, cmap.to_rgb_array(pred))


def test_throughput_predictor_download_modes_agree(tmp_path):
    """packed (2-bit, 12x fewer link bytes), pred, and color downloads
    produce identical output trios."""
    import jax
    import jax.numpy as jnp

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.pipeline import ThroughputPredictor
    from page_segmentation_tpu.models.fcn import FCNSkip

    module = FCNSkip(n_classes=3)
    rng = np.random.RandomState(0)
    pages = rng.randint(0, 255, (3, 400, 296)).astype(np.uint8)
    binaries = np.where(pages < 128, 0, 255).astype(np.uint8)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]

    outs = {}
    for mode in ("pred", "packed", "color"):
        tp = ThroughputPredictor(module, params, DEFAULT_IMAGE_MAP.palette,
                                 (400, 296), 6 / 50, host_decimate=8,
                                 compute_dtype=jnp.float32, download=mode)
        outs[mode] = list(tp.run(pages, binaries, batch_size=3))[0]
    for i in range(3):
        np.testing.assert_array_equal(outs["pred"][i], outs["packed"][i])
        np.testing.assert_array_equal(outs["pred"][i], outs["color"][i])


def test_pack_classes_wire_dtype():
    """The packed download must actually be uint8 bytes on the wire
    (a sum that promotes to uint32 would silently quadruple link bytes)."""
    import jax.numpy as jnp

    from page_segmentation_tpu.inference.output import pack_classes_device, unpack_classes

    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randint(0, 4, (2, 8, 16)).astype(np.uint8))
    packed = pack_classes_device(pred)
    assert packed.dtype == jnp.uint8
    assert packed.shape == (2, 8, 4)
    np.testing.assert_array_equal(unpack_classes(np.asarray(packed)), np.asarray(pred))


def test_throughput_predictor_odd_page_shape():
    """Page dims not divisible by host_decimate (and odd normalized dims)
    still produce the exact trio shapes, in every download mode."""
    import jax
    import jax.numpy as jnp

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.pipeline import ThroughputPredictor
    from page_segmentation_tpu.models.fcn import FCNSkip

    module = FCNSkip(n_classes=3)
    rng = np.random.RandomState(1)
    h, w = 403, 301  # not multiples of 8
    pages = rng.randint(0, 255, (2, h, w)).astype(np.uint8)
    binaries = np.where(pages < 128, 0, 255).astype(np.uint8)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]

    outs = {}
    for mode in ("pred", "packed", "color"):
        tp = ThroughputPredictor(module, params, DEFAULT_IMAGE_MAP.palette,
                                 (h, w), 6 / 50, host_decimate=8,
                                 compute_dtype=jnp.float32, download=mode)
        got = list(tp.run(pages, binaries, batch_size=3))
        assert len(got) == 1
        color, overlay, inverted = got[0]
        out_h, out_w = tp.fused.valid_shape
        assert color.shape == (2, out_h, out_w, 3)
        assert overlay.shape == color.shape and inverted.shape == color.shape
        outs[mode] = got[0]
    for i in range(3):
        np.testing.assert_array_equal(outs["pred"][i], outs["packed"][i])
        np.testing.assert_array_equal(outs["pred"][i], outs["color"][i])


def test_fast_path_high_res_output_matches_slow_path():
    """predict_dataset_fast with high_res_output upscales the label map to
    the original page shape before post/output, exactly like the per-page
    path (reference predictor.py:35-41 ordering)."""
    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.data.dataset import Dataset, SingleData
    from page_segmentation_tpu.inference.classifier import PixelClassifier
    from page_segmentation_tpu.inference.postprocess import vote_connected_component_class
    from page_segmentation_tpu.inference.predictor import Predictor, PredictSettings

    rng = np.random.RandomState(5)
    pages = []
    for i in range(2):
        full = rng.randint(0, 256, (80, 64)).astype(np.uint8)
        small = full[::2, ::2].copy()
        pages.append(
            SingleData(
                image=small,
                binary=(small > 128).astype(np.uint8),
                orig_binary=(full > 128).astype(np.uint8),
                original_shape=(80, 64),
                output_path=f"p{i}.png",
            )
        )
    dataset = Dataset(pages, DEFAULT_IMAGE_MAP)
    classifier = PixelClassifier(n_classes=3)

    settings = PredictSettings(
        n_classes=3, color_map=DEFAULT_IMAGE_MAP, high_res_output=True,
        post_process=[vote_connected_component_class],
    )
    predictor = Predictor(settings, network=classifier)

    slow = [predictor.predict_single(d) for d in dataset.data]
    fast = list(predictor.predict_dataset_fast(dataset, batch_size=2))
    assert len(fast) == 2
    for s, (fd, fp, fc, fo, fi) in zip(slow, fast):
        assert fp.shape == (80, 64)
        np.testing.assert_array_equal(np.asarray(fp), np.asarray(s.labels))


def test_fast_path_pow2_batch_bucketing(cmap):
    """Dynamic sub-batch sizes share pow2-padded programs: a long-lived
    service feeding sizes 1..batch_size must compile at most the pow2
    ladder, never one program per size (the recompile storm that stalled
    serving)."""
    import jax.numpy as jnp

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.data.dataset import Dataset, SingleData
    from page_segmentation_tpu.inference.classifier import PixelClassifier
    from page_segmentation_tpu.inference.predictor import Predictor, PredictSettings
    from page_segmentation_tpu.models.registry import Architecture

    classifier = PixelClassifier(
        n_classes=3, architecture=Architecture.FCN_SKIP, compute_dtype=jnp.float32
    )
    predictor = Predictor(
        PredictSettings(n_classes=3, color_map=DEFAULT_IMAGE_MAP,
                        device_post_process=False),
        network=classifier,
    )
    rng = np.random.RandomState(3)

    def run(n):
        entries = [
            SingleData(
                image=rng.randint(0, 256, (64, 48), np.uint8),
                binary=(rng.rand(64, 48) < 0.5).astype(np.uint8),
                line_height_px=6,
            )
            for _ in range(n)
        ]
        out = list(predictor.predict_dataset_fast(
            Dataset(entries, DEFAULT_IMAGE_MAP), batch_size=8))
        assert len(out) == n

    for n in (1, 2, 3, 5, 6, 7, 8):
        run(n)
    # sizes 1..8 may hit only the pow2 ladder {1, 2, 4, 8} of one bucket
    # (cache key = ("masks", images.shape, ...))
    batch_dims = {key[1][0] for key in classifier._masks_cache}
    assert batch_dims <= {1, 2, 4, 8}, batch_dims
    assert len(classifier._masks_cache) <= 4
