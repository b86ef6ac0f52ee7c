import numpy as np

from page_segmentation_tpu.data.prepare import prepare_images, prepare_mask


def _page(h=100, w=80):
    rng = np.random.RandomState(0)
    image = np.full((h, w), 255, np.uint8)
    image[20:40, 10:70] = 30  # dark text band
    binary = np.full((h, w), 255, np.uint8)
    binary[20:40, 10:70] = 0  # ink
    return image, binary


def test_prepare_images_contract():
    image, binary = _page()
    img, bin_ = prepare_images(image, binary, target_line_height=10, line_height_px=20)
    # scale 0.5 -> shape halves
    assert img.shape == (50, 40)
    assert bin_.shape == (50, 40)
    assert img.dtype == np.uint8 and bin_.dtype == np.uint8
    assert set(np.unique(bin_)) <= {0, 1}
    # inversion: white background becomes 0, ink becomes 1 / bright
    assert bin_[0, 0] == 0 and bin_[15, 20] == 1
    assert img[0, 0] < 10 and img[15, 20] > 150


def test_prepare_images_keep_orig_bin():
    image, binary = _page()
    img, bin_, orig = prepare_images(image, binary, 10, 20, keep_orig_bin=True)
    assert orig.shape == image.shape
    assert orig[0, 0] == 0 and orig[25, 20] == 1  # inverted original binary


def test_prepare_images_binary_01_input():
    image, binary = _page()
    img1, bin1 = prepare_images(image, binary, 10, 20)
    img2, bin2 = prepare_images(image, (binary / 255).astype(np.uint8), 10, 20)
    np.testing.assert_array_equal(bin1, bin2)


def test_prepare_images_max_width():
    image, binary = _page()
    img, bin_ = prepare_images(image, binary, 10, 10, max_width=30)
    assert bin_.shape[1] == 30
    assert img.shape == bin_.shape


def test_prepare_images_max_width_no_upscale():
    image, binary = _page()
    img, bin_ = prepare_images(image, binary, 10, 10, max_width=500)
    assert bin_.shape == (100, 80)


def test_prepare_images_pil_backend_close():
    image, binary = _page()
    a, _ = prepare_images(image, binary, 10, 20, resize_backend="scipy")
    b, _ = prepare_images(image, binary, 10, 20, resize_backend="pil")
    # backends agree closely away from edges; overshoot pixels differ by
    # design (scipy backend wraps like the reference's uint8 cast, PIL
    # clamps internally), so compare the agreeing majority
    diff = np.abs(a.astype(int) - b.astype(int))
    assert np.median(diff) == 0
    assert (diff < 8).mean() > 0.85


def test_prepare_mask():
    mask = np.array([[0, 1], [2, 1]], np.uint8)
    out = prepare_mask(mask, (4, 4))
    assert out.shape == (4, 4)
    assert set(np.unique(out)) <= {0, 1, 2}
    assert out.dtype == np.uint8


def test_prepare_overshoot_wraps_like_reference():
    """Cubic overshoot at sharp edges wraps modulo 256 on the uint8 cast —
    the reference's exact behavior (dataset.py:147), NOT a clip.  Models
    trained on reference-prepared pages see these pixels."""
    image = np.full((40, 40), 255, np.uint8)
    image[10:30, 10:30] = 0  # hard edge forces spline ringing
    binary = np.where(image < 128, 0, 255).astype(np.uint8)
    img, _ = prepare_images(image, binary, 9, 10)  # mild downscale
    # find the raw float values to know where overshoot happened
    from page_segmentation_tpu.ops.resize import resize_cubic

    bin_shape = img.shape
    raw = 1.0 - resize_cubic(image.astype(np.float64), bin_shape, anti_aliasing=True) / 255
    over = raw * 255 > 255.5
    under = raw * 255 < -0.5
    assert over.any() or under.any(), "test page produced no overshoot"
    expected = (raw * 255).astype(np.uint8)  # wrapping cast
    np.testing.assert_array_equal(img, expected)


def test_pil_backend_divergence_bounded():
    """The pil prepare backend is the declared throughput-over-parity
    opt-in (serve --resize_backend pil); this pins HOW far it strays from
    the spline parity path so a backend regression (wrong kernel, wrong
    coordinate convention, broken anti-aliasing) cannot hide behind the
    'not bit-parity' label.  Measured on production-like text pages:
    ~94% of pixels differ, mean |diff| ~5 gray levels, max ~31, no
    wraparound disagreements, binaries identical."""
    rng = np.random.RandomState(7)
    image = np.full((701, 493), 225, np.uint8)
    for row in range(60, 640, 22):
        cols = rng.randint(30, 460, size=14)
        for c in cols:
            image[row : row + 13, c : c + 7] = rng.randint(15, 70)
    binary = np.where(image < 128, 0, 255).astype(np.uint8)

    a_img, a_bin = prepare_images(image, binary, 6, 13, resize_backend="scipy")
    b_img, b_bin = prepare_images(image, binary, 6, 13, resize_backend="pil")
    assert a_img.shape == b_img.shape
    # the binary chain is backend-independent (nearest gather)
    np.testing.assert_array_equal(a_bin, b_bin)
    diff = a_img.astype(np.int16) - b_img.astype(np.int16)
    wrap = np.abs(diff) > 200  # uint8-wraparound disagreements
    assert wrap.mean() < 0.001, wrap.mean()
    assert np.abs(diff[~wrap]).max() <= 60, np.abs(diff[~wrap]).max()
    assert np.abs(diff[~wrap]).mean() <= 12, np.abs(diff[~wrap]).mean()
