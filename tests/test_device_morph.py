"""Device (XLA) batched binary morphology vs the host (cv2/scipy) chain.

The segmentation stage's char_height-sized close/open/dilate chain
(reference pc_segmentation.py:70-116) dispatches to one jitted
integral-image program on TPU (segmentation/device_morph.py).  These
gates pin the device backend bit-equal to the host ops — including even
kernels and cv2's border conventions — and the batched contours API
equal to the per-page reference-shaped path.
"""
import numpy as np
import pytest

from page_segmentation_tpu.ops import morphology
from page_segmentation_tpu.segmentation.device_morph import (
    TextRegionMorphDevice,
    dilate_box,
    erode_box,
    morph_kernels,
    text_region_chain,
)
from page_segmentation_tpu.segmentation.pc_segmentation import (
    contours_from_region_mask,
    get_text_contours,
    get_text_contours_batch,
    text_region_mask,
)


@pytest.mark.parametrize("kh,kw", [(1, 1), (3, 3), (4, 4), (2, 5), (5, 2),
                                   (6, 6), (7, 3), (16, 16), (40, 40),
                                   (60, 9)])  # incl. kernels > the image
def test_box_ops_equal_host_morphology(kh, kw):
    rng = np.random.RandomState(kh * 10 + kw)
    masks = rng.rand(3, 23, 31) < 0.3
    d_dev = np.asarray(dilate_box(masks, kh, kw))
    e_dev = np.asarray(erode_box(masks, kh, kw))
    for i in range(masks.shape[0]):
        m_u8 = masks[i].astype(np.uint8) * 255
        assert np.array_equal(d_dev[i], morphology.dilate(m_u8, (kh, kw)) > 0)
        assert np.array_equal(e_dev[i], morphology.erode(m_u8, (kh, kw)) > 0)


@pytest.mark.parametrize("ch", [3, 7, 10, 11])
def test_chain_equals_host(ch):
    """The device chain must reproduce the host chain exactly per
    char_height (11/1.1 exercises the float-division quirk)."""
    rng = np.random.RandomState(ch)
    masks = rng.rand(4, 40, 56) < 0.25
    out = np.asarray(text_region_chain(masks, morph_kernels(ch)))
    for i in range(masks.shape[0]):
        host = text_region_mask(masks[i].astype(np.uint8) * 255, ch)
        assert np.array_equal(out[i], host > 0), f"page {i} ch={ch}"


def test_native_chain_equals_cv2_composition():
    """The native bit-packed chain (the text_region_mask fast path) must
    equal the explicit cv2/scipy op composition — the semantic contract —
    so the fast path can never drift from the reference chain."""
    from page_segmentation_tpu import native

    rng = np.random.RandomState(7)
    # ch=70/130 cross the 64-bit word boundary (k > 64, two-word left
    # extensions) — the production 300-DPI char-height regime (advisor r4)
    for ch in (3, 7, 10, 11, 16, 70, 130):
        k, k3, k11 = morph_kernels(ch)
        h, w = (190, 230) if k > 16 else (60, 83)
        m = (rng.rand(h, w) < 0.25).astype(np.uint8) * 255
        got = native.bitmorph_chain(m, k, k3, k11)
        if got is None:
            pytest.skip("native library unavailable")
        ref = morphology.morph_close(
            morphology.dilate(
                morphology.morph_open(
                    morphology.morph_close(m, (k, k)), (k3, k3)),
                (k11, k11), iterations=1),
            (k11, k11))
        assert np.array_equal(got, ref), ch


def test_morph_kernels_reference_semantics():
    # int(char_height / 1.1) truncates the float quotient — the reference's
    # exact expression, reproduced verbatim (not a rational rounding)
    for ch in (1, 3, 7, 10, 11, 33, 50, 110):
        assert morph_kernels(ch) == (
            max(int(ch), 1), max(int(ch / 3), 1), max(int(ch / 1.1), 1))
    assert morph_kernels(0) == (1, 1, 1)


@pytest.mark.parametrize("n,w", [(2, 56), (3, 53)])  # ragged width + batch
def test_device_runner_pack_roundtrip(n, w):
    rng = np.random.RandomState(1)
    masks = rng.rand(n, 30, w) < 0.3
    dev = TextRegionMorphDevice()
    out = dev.run(masks, morph_kernels(5))
    assert out.shape == masks.shape and out.dtype == np.uint8
    assert set(np.unique(out)) <= {0, 255}
    for i in range(n):
        host = text_region_mask(masks[i].astype(np.uint8) * 255, 5)
        assert np.array_equal(out[i] > 0, host > 0)
    # program cache: same (padded batch, shape, kernels) reuses the fn —
    # n=3 pads to 4, so a second n=3 run hits the same program
    assert len(dev._programs) == 1
    dev.run(masks, morph_kernels(5))
    assert len(dev._programs) == 1
    # a different char_height is a new program (static kernels)
    dev.run(masks, morph_kernels(8))
    assert len(dev._programs) == 2


def test_batch_contours_device_equals_per_page():
    """get_text_contours_batch (device morph) == get_text_contours page by
    page, on synthetic pages with text blocks + specks."""
    from page_segmentation_tpu.core.colors import ColorMap

    cmap = ColorMap({"(255, 255, 255)": (0, "background"),
                     "(255, 0, 0)": (1, "text"),
                     "(0, 255, 0)": (2, "image")})
    text_rgb = cmap.color_for_label("text")
    rng = np.random.RandomState(2)
    pages, masks, chs = [], [], []
    for i in range(3):
        img = np.full((64, 80, 3), 255, np.uint8)
        for r in range(8, 56, 12):  # text lines
            img[r : r + 4, 10:70] = text_rgb
        # speckle noise
        ys, xs = rng.randint(0, 64, 9), rng.randint(0, 80, 9)
        img[ys, xs] = text_rgb
        pages.append(img)
        masks.append((img == np.asarray(text_rgb)).all(-1))
        chs.append(4 + i)
    batched = get_text_contours_batch(
        np.stack(masks), chs, device_morph=TextRegionMorphDevice())
    host_batched = get_text_contours_batch(np.stack(masks), chs)
    for i in range(3):
        per_page = get_text_contours(pages[i], chs[i], cmap)
        for got in (batched[i], host_batched[i]):
            assert len(got) == len(per_page)
            for a, b in zip(got, per_page):
                assert np.array_equal(a.contour, b.contour)


def test_contours_from_region_mask_matches_legacy_split():
    """The factored pieces compose to the original get_text_contours."""
    from page_segmentation_tpu.core.colors import ColorMap

    cmap = ColorMap({"(255, 255, 255)": (0, "background"),
                     "(255, 0, 0)": (1, "text")})
    img = np.full((40, 40, 3), 255, np.uint8)
    img[5:12, 5:35] = cmap.color_for_label("text")
    img[20:27, 5:35] = cmap.color_for_label("text")
    legacy = get_text_contours(img, 5, cmap)
    mask = (img == np.asarray(cmap.color_for_label("text"))).all(-1)
    split = contours_from_region_mask(
        text_region_mask(mask.astype(np.uint8) * 255, 5))
    assert len(legacy) == len(split)
    for a, b in zip(legacy, split):
        assert np.array_equal(a.contour, b.contour)


def test_any_bbox_nested_vectorized():
    from page_segmentation_tpu.segmentation.pc_segmentation import _any_bbox_nested

    disjoint = [np.array([[0, 0], [0, 5], [5, 5], [5, 0]]),
                np.array([[10, 10], [10, 15], [15, 15], [15, 10]])]
    assert _any_bbox_nested(disjoint) is False
    nested = disjoint + [np.array([[1, 1], [1, 2], [2, 2]])]
    assert _any_bbox_nested(nested) is True
    assert _any_bbox_nested([disjoint[0]]) is False
    # identical boxes count as (mutually) contained — the conservative
    # answer keeps the refind pass
    assert _any_bbox_nested([disjoint[0], disjoint[0].copy()]) is True
