

def test_imsave_bilevel_roundtrip(tmp_path):
    """1-bit PNG binaries decode bit-equal to the 0/255 uint8 encoding
    through both imread and imread_bin (the recommended pre-binarized
    dataset layout — ~8x less inflate per read)."""
    import numpy as np

    from page_segmentation_tpu.core.image_io import (
        imread, imread_bin, imsave, imsave_bilevel)

    rng = np.random.RandomState(0)
    binary = np.where(rng.rand(75, 53) < 0.4, np.uint8(255), np.uint8(0))
    p1 = str(tmp_path / "bin1.png")
    p8 = str(tmp_path / "bin8.png")
    imsave_bilevel(p1, binary)
    imsave(p8, binary)
    np.testing.assert_array_equal(imread_bin(p1), imread_bin(p8))
    np.testing.assert_array_equal(imread_bin(p1), binary)
    np.testing.assert_array_equal(imread(p1, as_gray=True), binary)
    # nonzero (not just 255) input still maps to 0/255
    imsave_bilevel(p1, (binary > 0).astype(np.uint8))
    np.testing.assert_array_equal(imread_bin(p1), binary)


def test_gray_fast_roundtrip_and_fallback(tmp_path):
    """Filter-0 grayscale PNGs decode through the inflate-only fast path
    bit-equal to the general decoders; filtered PNGs (PIL/cv2-written)
    still decode through the general path, pixels identical."""
    import numpy as np

    from page_segmentation_tpu.core.image_io import (
        _decode_png_filter0_gray, imread, imsave, imsave_gray_fast)

    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (83, 61), np.uint8)
    fast = str(tmp_path / "fast.png")
    ref = str(tmp_path / "ref.png")
    imsave_gray_fast(fast, img)
    imsave(ref, img)
    np.testing.assert_array_equal(imread(fast, as_gray=True), img)
    np.testing.assert_array_equal(imread(fast), np.stack([img] * 3, -1))
    np.testing.assert_array_equal(imread(ref, as_gray=True), img)
    # the fast decoder really engaged for its own file and declined PIL's
    with open(fast, "rb") as f:
        assert _decode_png_filter0_gray(f.read()) is not None
    with open(ref, "rb") as f:
        ref_fast = _decode_png_filter0_gray(f.read())
    if ref_fast is not None:  # PIL happened to emit all filter-0 rows
        np.testing.assert_array_equal(ref_fast, img)
    # PIL itself reads the fast file identically
    from PIL import Image
    np.testing.assert_array_equal(np.asarray(Image.open(fast)), img)
