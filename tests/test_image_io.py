

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


def test_fast_decoders_return_none_on_corrupt_input(tmp_path):
    """Truncated/garbled PNGs must make the fast paths decline (None /
    general-decoder fallback), never raise zlib/struct errors from a
    prefetch thread (round-4 review finding)."""
    import numpy as np
    import pytest

    from page_segmentation_tpu.core.image_io import (
        _decode_png_filter0_gray, decode_image_bytes, decode_labels_bytes,
        imread_bilevel_packed, imsave_bilevel, imsave_gray_fast)

    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (40, 56), np.uint8)
    gray = str(tmp_path / "g.png")
    bil = str(tmp_path / "b.png")
    imsave_gray_fast(gray, img)
    imsave_bilevel(bil, img > 128)
    for path in (gray, bil):
        data = open(path, "rb").read()
        # cut points that truncate the header or mid-IDAT (cutting only
        # the IEND trailer leaves a decodable stream, which is fine)
        for cut in (12, 40, len(data) // 2):
            truncated = data[:cut]
            assert _decode_png_filter0_gray(truncated) is None
            assert decode_labels_bytes(truncated) is None
        # flip a byte INSIDE the zlib stream: the inflate's adler32
        # catches it (a flipped chunk-CRC byte is deliberately ignored —
        # the pixel data is intact and zlib checksums the real content)
        garbled = data[:60] + bytes([data[60] ^ 0xFF]) + data[61:]
        assert _decode_png_filter0_gray(garbled) is None
    # truncated bilevel file on disk: packed reader declines
    trunc_path = str(tmp_path / "t.png")
    with open(trunc_path, "wb") as f:
        f.write(open(bil, "rb").read()[:40])
    assert imread_bilevel_packed(trunc_path) is None
    assert imread_bilevel_packed(str(tmp_path / "missing.png")) is None
    # a truly corrupt file still raises a MEANINGFUL error from the
    # general path, not from the fast path
    with pytest.raises(Exception):
        decode_image_bytes(open(bil, "rb").read()[:40])
