"""Native C++ kernels: build, equivalence with the Python fallbacks, speed."""
import numpy as np
import pytest

from page_segmentation_tpu import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library could not be built")
    return native.get_lib()


def test_native_builds(lib):
    assert lib is not None


def test_cc_matches_scipy(lib):
    from page_segmentation_tpu.ops import cc as cc_mod

    rng = np.random.RandomState(0)
    img = (rng.rand(80, 60) > 0.6).astype(np.uint8)
    for connectivity in (4, 8):
        n_n, labels_n, stats_n, cent_n = native.cc_with_stats(img, connectivity)

        # scipy fallback path (bypass the native hook)
        from scipy import ndimage as ndi

        structure = cc_mod._STRUCTURE[connectivity]
        labels_s, num = ndi.label(img != 0, structure=structure)
        assert n_n == num + 1
        np.testing.assert_array_equal(labels_n, labels_s)

        areas = np.bincount(labels_s.ravel(), minlength=n_n)
        np.testing.assert_array_equal(stats_n[:, 4], areas)
        objects = ndi.find_objects(labels_s)
        for i, slc in enumerate(objects, start=1):
            ys, xs = slc
            assert stats_n[i, 0] == xs.start
            assert stats_n[i, 1] == ys.start
            assert stats_n[i, 2] == xs.stop - xs.start
            assert stats_n[i, 3] == ys.stop - ys.start


def test_cc_vote_matches_python(lib):
    from page_segmentation_tpu.data.dataset import SingleData
    from page_segmentation_tpu.inference.postprocess import vote_connected_component_class

    rng = np.random.RandomState(1)
    binary = (rng.rand(60, 50) > 0.6).astype(np.uint8)
    pred = rng.randint(0, 4, (60, 50)).astype(np.int64)

    native_out = native.cc_vote(binary, pred, 4)

    # Python/scipy histogram implementation, native hook bypassed
    from page_segmentation_tpu.ops.cc import connected_components_with_stats

    num_labels, labels, _, _ = connected_components_with_stats(binary, connectivity=4)
    counts = np.bincount(
        labels.ravel().astype(np.int64) * 4 + pred.ravel(), minlength=num_labels * 4
    ).reshape(num_labels, 4)
    majority = np.argmax(counts, axis=1)
    expected = pred.copy()
    expected[labels > 0] = majority[labels[labels > 0]]

    np.testing.assert_array_equal(native_out, expected)
    # the public entry point also dispatches to native
    out2 = vote_connected_component_class(pred, SingleData(binary=binary))
    np.testing.assert_array_equal(out2, expected)


def test_contours_fill_roundtrip(lib):
    from page_segmentation_tpu.ops.contours import fill_contour

    mask = np.zeros((40, 40), np.uint8)
    mask[5:15, 5:25] = 255
    mask[25:35, 28:38] = 255
    result = native.contours(mask)
    assert len(result) == 2
    refilled = np.zeros_like(mask)
    for c in result:
        fill_contour(refilled, c, 255)
    np.testing.assert_array_equal(refilled > 0, mask > 0)


def test_native_cc_speed(lib):
    """Native one-pass labeling should not be slower than scipy 3-pass."""
    import time

    rng = np.random.RandomState(0)
    img = (rng.rand(1000, 800) > 0.5).astype(np.uint8)

    t = time.perf_counter()
    for _ in range(3):
        native.cc_with_stats(img, 4)
    native_time = (time.perf_counter() - t) / 3

    from scipy import ndimage as ndi

    t = time.perf_counter()
    for _ in range(3):
        labels, n = ndi.label(img)
        ndi.find_objects(labels)
        np.bincount(labels.ravel())
    scipy_time = (time.perf_counter() - t) / 3
    # generous bound: native must be within 2x of scipy (usually faster)
    assert native_time < scipy_time * 2, (native_time, scipy_time)


class TestPredictHostKernels:
    """Native decimate/gather/finish match the PIL/numpy fallbacks exactly."""

    def test_decimate_matches_pil(self):
        from PIL import Image

        from page_segmentation_tpu import native

        if not native.available():
            pytest.skip("no native lib")
        rng = np.random.RandomState(0)
        pages = rng.randint(0, 256, (3, 101, 83)).astype(np.uint8)
        out = native.decimate_u8(pages, 4)
        ref = np.stack([np.asarray(Image.fromarray(p).reduce(4)) for p in pages])
        np.testing.assert_array_equal(out, ref[:, : out.shape[1], : out.shape[2]])

    def test_gather_ink_matches_numpy(self):
        from page_segmentation_tpu import native
        from page_segmentation_tpu.inference.pipeline import nearest_index_array

        if not native.available():
            pytest.skip("no native lib")
        rng = np.random.RandomState(1)
        binaries = rng.randint(0, 256, (2, 90, 70)).astype(np.uint8)
        ri = nearest_index_array(31, 90).astype(np.int32)
        ci = nearest_index_array(23, 70).astype(np.int32)
        out = native.gather_ink(binaries, ri, ci)
        ref = np.stack([b[np.ix_(ri, ci)] < 128 for b in binaries])
        np.testing.assert_array_equal(out.astype(bool), ref)

    def test_finish_masks_matches_numpy(self):
        from page_segmentation_tpu import native

        if not native.available():
            pytest.skip("no native lib")
        rng = np.random.RandomState(2)
        pred = rng.randint(0, 3, (2, 40, 36)).astype(np.uint8)  # padded
        ink = rng.rand(2, 37, 33) < 0.4
        palette = np.array([[255, 255, 255], [255, 0, 0], [0, 255, 0]], np.uint8)
        color, overlay, inverted = native.finish_masks(pred, ink.astype(np.uint8), palette)
        cref = palette[pred[:, :37, :33]]
        np.testing.assert_array_equal(color, cref)
        np.testing.assert_array_equal(overlay, cref * (~ink[..., None]).astype(np.uint8))
        np.testing.assert_array_equal(inverted, cref * ink[..., None].astype(np.uint8))


def test_finish_masks_packed_matches_unpacked():
    """ps_finish_packed (2-bit classes read in-kernel) equals
    unpack_classes + ps_finish bitwise, including padded packed rows and
    the out= reuse path."""
    from page_segmentation_tpu import native
    from page_segmentation_tpu.inference.output import unpack_classes

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(1)
    n, oh, ow = 3, 57, 41
    pw = (ow + 3) // 4 + 2  # packed rows wider than needed (device padding)
    packed = rng.randint(0, 256, (n, 60, pw), np.uint8)
    ink = (rng.rand(n, oh, ow) < 0.3).astype(np.uint8)
    palette = np.asarray([[255, 255, 255], [255, 0, 0], [0, 255, 0]], np.uint8)
    ref = native.finish_masks(unpack_classes(packed), ink, palette)
    got = native.finish_masks_packed(packed, ink, palette)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)
    bufs = tuple(np.empty((n, oh, ow, 3), np.uint8) for _ in range(3))
    reused = native.finish_masks_packed(packed, ink, palette, out=bufs)
    assert reused[0] is bufs[0]
    for a, b in zip(ref, reused):
        np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError, match="C-contiguous"):
        native.finish_masks_packed(
            packed, ink, palette,
            out=tuple(np.empty((n, oh, ow, 3), np.int32) for _ in range(3)))


def test_pipeline_reuse_output_buffers_ring():
    """reuse_output_buffers hands out a 4-deep ring of identical-shape
    trios and the contents match the non-reusing pipeline."""
    import jax.numpy as jnp

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.pipeline import ThroughputPredictor
    from page_segmentation_tpu.models.fcn import FCNSkip

    import jax

    module = FCNSkip(n_classes=3, dtype=jnp.float32)
    params = module.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 1), np.float32))["params"]
    rng = np.random.RandomState(0)
    pages = rng.randint(0, 256, (4, 352, 256), np.uint8)
    binaries = np.where(pages >= 128, np.uint8(255), np.uint8(0))

    def run(reuse):
        p = ThroughputPredictor(
            module, params, DEFAULT_IMAGE_MAP.palette, (352, 256), 0.15,
            compute_dtype=jnp.float32, download="packed",
            reuse_output_buffers=reuse,
        )
        return [tuple(np.array(a) for a in trio)
                for trio in p.run(pages, binaries, batch_size=2)]

    plain = run(False)
    reused = run(True)
    assert len(plain) == len(reused)
    for (c1, o1, i1), (c2, o2, i2) in zip(plain, reused):
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(o1, o2)
        np.testing.assert_array_equal(i1, i2)


def test_finish_mask_trio_fallback_honors_out(monkeypatch):
    """Without the native lib, finish_mask_trio writes straight into the
    caller's reuse buffers and matches the native result."""
    from page_segmentation_tpu import native
    from page_segmentation_tpu.inference.output import finish_mask_trio

    rng = np.random.RandomState(2)
    n, oh, ow = 2, 33, 41
    pred = rng.randint(0, 3, (n, 40, 48), np.uint8)
    ink = (rng.rand(n, oh, ow) < 0.3).astype(np.uint8)
    palette = np.asarray([[255, 255, 255], [255, 0, 0], [0, 255, 0]], np.uint8)
    ref = finish_mask_trio(pred, ink, palette)

    monkeypatch.setattr(native, "finish_masks", lambda *a, **k: None)
    bufs = tuple(np.empty((n, oh, ow, 3), np.uint8) for _ in range(3))
    got = finish_mask_trio(pred, ink, palette, out=bufs)
    assert got[0] is bufs[0]
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_finish_bounds_guards():
    """Mismatched packed/pred vs ink shapes raise ValueError at the binding
    instead of reading out of bounds in the C kernels (which take the page
    count from the class-map argument and row count from ink)."""
    from page_segmentation_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    palette = np.asarray([[255, 255, 255], [255, 0, 0], [0, 255, 0]], np.uint8)
    packed = np.zeros((2, 10, 16), np.uint8)
    with pytest.raises(ValueError, match="height"):
        native.vote_finish_packed(packed, np.zeros((2, 20, 32), np.uint8), palette, 3)
    with pytest.raises(ValueError, match="pages"):
        native.vote_finish_packed(packed, np.zeros((1, 10, 32), np.uint8), palette, 3)
    with pytest.raises(ValueError, match="height"):
        native.finish_masks_packed(packed, np.zeros((2, 20, 32), np.uint8), palette)
    with pytest.raises(ValueError, match="pages"):
        native.finish_masks_packed(packed, np.zeros((1, 10, 32), np.uint8), palette)
    pred = np.zeros((2, 10, 16), np.uint8)
    with pytest.raises(ValueError, match="smaller"):
        native.finish_masks(pred, np.zeros((2, 20, 16), np.uint8), palette)
    with pytest.raises(ValueError, match="pages"):
        native.finish_masks(pred, np.zeros((1, 10, 16), np.uint8), palette)


def test_pack_unpack_indices_roundtrip_and_numpy_parity():
    """Native sub-byte index pack/unpack == the numpy strided formulation
    and round-trips exactly, for every sub-byte depth and ragged widths."""
    import numpy as np
    import pytest

    from page_segmentation_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(0)
    for depth in (1, 2, 4):
        k = 8 // depth
        for w in (64, 61, 63, 7):
            labels = rng.randint(0, 1 << depth, (23, w)).astype(np.uint8)
            packed = native.pack_indices(labels, depth)
            # numpy reference pack
            pad_w = (-w) % k
            padded = np.pad(labels, ((0, 0), (0, pad_w))) if pad_w else labels
            ref = np.zeros((23, padded.shape[1] // k), np.uint8)
            for i in range(k):
                np.bitwise_or(ref, padded[:, i::k] << ((k - 1 - i) * depth),
                              out=ref)
            np.testing.assert_array_equal(packed, ref)
            back = native.unpack_indices(packed, w, depth)
            np.testing.assert_array_equal(back, labels)
