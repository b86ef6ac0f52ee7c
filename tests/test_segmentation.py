import numpy as np
import pytest

from page_segmentation_tpu.core.colors import ColorMap
from page_segmentation_tpu.segmentation.xycut import (
    Gap,
    RectSegment,
    Segment1D,
    _get_gaps,
    _get_segments,
    do_xy_cut,
)


def test_get_gaps():
    indication = np.array([True, False, False, True, False, True])
    gaps = _get_gaps(indication)
    assert gaps == [Gap(start=1, length=2), Gap(start=4, length=1)]


def test_get_gaps_none():
    assert _get_gaps(np.array([True, True])) == []


def test_get_segments_filters_small_gaps():
    gaps = [Gap(10, 2), Gap(20, 8)]
    segments = _get_segments(gaps, length=40, px_threshold=3, split_size=5)
    # the 2-px gap is ignored; segments split only around the 8-px gap
    assert segments == [Segment1D(0, 20), Segment1D(28, 40)]


def test_xycut_two_columns():
    img = np.zeros((40, 60), np.uint8)
    img[5:35, 5:25] = 1
    img[5:35, 35:55] = 1
    segments = do_xy_cut(img, 3, 3, 4, 4)
    assert len(segments) >= 2
    # reference convention: x is the row axis, y the column axis
    # (xycut.py _relative_seg; consistent with render.py's as_xy ordering)
    ys = sorted(s.y_start for s in segments)
    assert ys[0] < 30 < ys[-1]


def test_xycut_single_block():
    img = np.zeros((20, 20), np.uint8)
    img[2:18, 2:18] = 1
    segments = do_xy_cut(img, 2, 2, 3, 3)
    assert len(segments) == 1
    s = segments[0]
    assert min(s.x_start, s.y_start) <= 2 and max(s.x_end, s.y_end) >= 17


def test_rect_segment_scale_and_of():
    seg = RectSegment(2, 4, 6, 8)
    scaled = seg.scale(2.0)
    assert (scaled.x_start, scaled.y_start, scaled.x_end, scaled.y_end) == (4, 8, 12, 16)
    img = np.arange(100).reshape(10, 10)
    np.testing.assert_array_equal(seg.of(img), img[4:8, 2:6])
    assert seg.polygon_coords() == [(2, 4), (6, 4), (6, 8), (2, 8)]


@pytest.fixture
def cmap():
    return ColorMap(
        {
            "(255, 255, 255)": (0, "background"),
            "(0, 0, 255)": (1, "text"),
            "(0, 255, 0)": (2, "image"),
        }
    )


def test_find_segments_end_to_end(cmap):
    from page_segmentation_tpu.segmentation.pc_segmentation import find_segments

    pred = np.zeros((200, 160), np.int32)
    pred[20:90, 20:140] = 1  # text block
    pred[120:180, 30:130] = 2  # image block
    rgb = cmap.to_rgb_array(pred)
    segments_text, segments_image = find_segments(200, rgb, char_height=10, resize_height=100, color_map=cmap)
    assert len(segments_text) >= 1
    assert len(segments_image) >= 1


def test_find_segments_only_images(cmap):
    from page_segmentation_tpu.segmentation.pc_segmentation import find_segments

    pred = np.zeros((100, 100), np.int32)
    pred[10:90, 10:90] = 2
    rgb = cmap.to_rgb_array(pred)
    texts, images = find_segments(100, rgb, 8, 100, cmap, only_images=True)
    assert texts == []
    assert len(images) >= 1


def test_get_text_contours(cmap):
    from page_segmentation_tpu.segmentation.pc_segmentation import get_text_contours

    pred = np.zeros((120, 120), np.int32)
    pred[20:60, 20:100] = 1
    rgb = cmap.to_rgb_array(pred)
    contours = get_text_contours(rgb, char_height=8, color_map=cmap)
    assert len(contours) >= 1
    pts = np.atleast_2d(contours[0].contour)
    # contour encloses the text block region (allow morphology growth)
    assert pts[:, 0].min() <= 25 and pts[:, 0].max() >= 90


def test_refind_skip_equals_fill_refind_dance():
    # the bbox-gated refind skip in get_text_contours must be an identity:
    # on random blob masks, compare the gated extraction against the
    # unconditional fill-then-refind dance
    from page_segmentation_tpu.ops.contours import fill_contour, find_external_contours
    from page_segmentation_tpu.segmentation import pc_segmentation as pcs

    def dance(mask):
        filled = np.zeros(mask.shape, np.uint8)
        cs = find_external_contours(mask)
        for c in cs:
            fill_contour(filled, c, 255)
        return find_external_contours(filled)

    def gated(mask):
        cs = find_external_contours(mask)
        if pcs._any_bbox_nested(cs):
            filled = np.zeros(mask.shape, np.uint8)
            for c in cs:
                fill_contour(filled, c, 255)
            cs = find_external_contours(filled)
        return cs

    rng = np.random.RandomState(42)
    skipped = 0
    for _ in range(60):
        h, w = rng.randint(15, 90), rng.randint(15, 90)
        mask = (rng.rand(h, w) < rng.uniform(0.1, 0.5)).astype(np.uint8) * 255
        a, b = dance(mask), gated(mask)
        assert len(a) == len(b)
        for ca, cb in zip(a, b):
            np.testing.assert_array_equal(ca, cb)
        if not pcs._any_bbox_nested(find_external_contours(mask)):
            skipped += 1
    assert skipped > 0  # the fast path actually exercises


def test_refind_dance_still_swallows_nested_components():
    # a blob inside a ring's hole must still be swallowed by the dance —
    # the bbox gate may not skip it
    from page_segmentation_tpu.ops.contours import find_external_contours
    from page_segmentation_tpu.segmentation import pc_segmentation as pcs

    mask = np.zeros((40, 40), np.uint8)
    mask[5:35, 5:35] = 255
    mask[10:30, 10:30] = 0  # hole
    mask[15:25, 15:25] = 255  # nested blob
    cs = find_external_contours(mask)
    assert len(cs) == 2
    assert pcs._any_bbox_nested(cs)


def test_render_xycut(cmap, tmp_path):
    from page_segmentation_tpu.segmentation.render import render_regions, render_xycut

    out = render_regions(
        str(tmp_path),
        "png",
        (50, 40),
        "pred/page.png",
        cmap,
        render_xycut,
        [RectSegment(5, 5, 15, 15)],
        [RectSegment(20, 20, 35, 30)],
    )
    from PIL import Image

    # the saved artifact is a paletted PNG; the contract is the decoded RGB
    img = np.asarray(Image.open(out).convert("RGB"))
    assert img.shape == (50, 40, 3)
    np.testing.assert_array_equal(img[10, 10], (0, 0, 255))   # text rect
    np.testing.assert_array_equal(img[30, 25], (0, 255, 0))   # image rect
    np.testing.assert_array_equal(img[0, 0], (255, 255, 255))  # base


def test_render_palette_matches_rgb_painting(cmap, tmp_path):
    # the palette-index fast path must decode to the exact RGB canvas the
    # reference-semantics RGB painting produces (both region render modes)
    from PIL import Image

    from page_segmentation_tpu.ops.contours import find_external_contours
    from page_segmentation_tpu.segmentation.render import (
        render_contours,
        render_morphological,
        render_rect_segments,
        render_xycut,
    )
    from page_segmentation_tpu.segmentation.xycut import CVContour

    texts = [RectSegment(5, 5, 15, 15), RectSegment(-3, 2, 8, 9)]
    images = [RectSegment(20, 20, 35, 30), RectSegment(12, 12, 22, 22)]
    fast = np.asarray(render_xycut((50, 40), cmap, texts, images).convert("RGB"))
    slow = np.asarray(
        render_rect_segments(
            (40, 50),
            [
                (cmap.color_for_label("text"), texts),
                (cmap.color_for_label("image"), images),
            ],
        )
    )
    np.testing.assert_array_equal(fast, slow)

    blob = np.zeros((50, 40), np.uint8)
    blob[6:18, 8:30] = 255
    contours = [CVContour(c) for c in find_external_contours(blob)]
    fast_m = np.asarray(
        render_morphological((50, 40), cmap, contours, images).convert("RGB")
    )
    base = render_rect_segments((50, 40), [(cmap.color_for_label("image"), images)])
    slow_m = np.asarray(render_contours(base, contours, cmap.color_for_label("text")))
    np.testing.assert_array_equal(fast_m, slow_m)


def test_render_non_png_extension(cmap, tmp_path):
    # palette canvases must transparently convert for encoders that cannot
    # take mode-P input (e.g. JPEG)
    from PIL import Image

    from page_segmentation_tpu.segmentation.render import render_regions, render_xycut

    out = render_regions(
        str(tmp_path), "jpg", (50, 40), "pred/page.png", cmap,
        render_xycut, [RectSegment(5, 5, 15, 15)], [],
    )
    assert out.endswith(".jpg")
    assert np.asarray(Image.open(out).convert("RGB")).shape == (50, 40, 3)


def test_contours_roundtrip():
    from page_segmentation_tpu.ops.contours import fill_contour, find_external_contours

    mask = np.zeros((30, 30), np.uint8)
    mask[5:15, 5:20] = 255
    mask[20:28, 22:28] = 255
    contours = find_external_contours(mask)
    assert len(contours) == 2
    refilled = np.zeros_like(mask)
    for c in contours:
        fill_contour(refilled, c, 255)
    # refilling the traced contours reproduces the rectangles
    np.testing.assert_array_equal(refilled > 0, mask > 0)


def _exterior_boundary(mask):
    """Oracle: component pixels 4-adjacent to the exterior background
    (the pixels Moore tracing must visit for 8-connected components)."""
    from scipy import ndimage as ndi

    padded = np.pad(mask, 1).astype(bool)
    ext, _ = ndi.label(~padded)  # 4-connectivity
    exterior = ext == ext[0, 0]
    return (ndi.binary_dilation(exterior) & padded)[1:-1, 1:-1]


def _polyline_pixels(points):
    out = []
    pts = [tuple(p) for p in points]
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        n = max(abs(x1 - x0), abs(y1 - y0)) or 1
        for k in range(n + 1):
            out.append((y0 + (y1 - y0) * k // n, x0 + (x1 - x0) * k // n))
    if pts:
        out.append((pts[-1][1], pts[-1][0]))
    return out


@pytest.mark.parametrize("use_native", [True, False])
def test_contours_cover_all_boundary_pixels(use_native, monkeypatch):
    """Fuzz both tracers: every exterior-boundary pixel of every component
    must appear on its traced contour (Jacob's stopping criterion —
    the weak start-reentry criterion truncated ~10% of random masks)."""
    from page_segmentation_tpu import native
    from page_segmentation_tpu.ops.contours import find_external_contours

    if use_native and not native.available():
        pytest.skip("no native lib")
    if not use_native:
        monkeypatch.setattr(native, "contours", lambda *_: None)

    rng = np.random.RandomState(7)
    cases = [np.array([[0, 1, 0, 0], [1, 0, 1, 0], [1, 0, 1, 1]], np.uint8)]
    for _ in range(120):
        cases.append(
            (rng.rand(rng.randint(4, 18), rng.randint(4, 18)) > rng.uniform(0.3, 0.7)).astype(np.uint8)
        )
    for mask in cases:
        want = _exterior_boundary(mask)
        covered = np.zeros_like(mask, bool)
        for contour in find_external_contours(mask):
            for y, x in _polyline_pixels(np.atleast_2d(contour)):
                covered[y, x] = True
        missing = want & ~covered
        assert not missing.any(), f"untraced boundary pixels:\n{mask}\n{missing.astype(int)}"
