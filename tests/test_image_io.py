import numpy as np
import pytest
from PIL import Image

from page_segmentation_tpu.core import image_io




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
        _decode_png_gray_fast, imread, imsave, imsave_gray_fast)

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
        assert _decode_png_gray_fast(f.read()) is not None
    with open(ref, "rb") as f:
        ref_fast = _decode_png_gray_fast(f.read())
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
        _decode_png_gray_fast, decode_image_bytes, decode_labels_bytes,
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
            assert _decode_png_gray_fast(truncated) is None
            assert decode_labels_bytes(truncated) is None
        # flip a byte INSIDE the zlib stream: the inflate's adler32
        # catches it (a flipped chunk-CRC byte is deliberately ignored —
        # the pixel data is intact and zlib checksums the real content)
        garbled = data[:60] + bytes([data[60] ^ 0xFF]) + data[61:]
        assert _decode_png_gray_fast(garbled) is None
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


def _png_gray_with_filters(image: np.ndarray, filters) -> bytes:
    """Build a valid 8-bit grayscale PNG applying the given PNG filter
    type to each row (cycled) — real-world encoders emit these adaptive
    filters, PIL included; this builder pins them deterministically."""
    import struct
    import zlib

    h, w = image.shape
    out = bytearray()
    prev = np.zeros(w, np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        cur = image[y].astype(np.int32)
        left = np.concatenate([[0], cur[:-1]])
        upleft = np.concatenate([[0], prev[:-1]])
        if f == 0:
            enc = cur
        elif f == 1:  # sub
            enc = cur - left
        elif f == 2:  # up
            enc = cur - prev
        elif f == 3:  # average
            enc = cur - ((left + prev) >> 1)
        else:  # paeth
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = cur - pred
        out.append(f)
        out.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    raw = zlib.compress(bytes(out), 6)

    def chunk(tag, payload):
        import binascii
        body = tag + payload
        return (struct.pack(">I", len(payload)) + body
                + struct.pack(">I", binascii.crc32(body) & 0xFFFFFFFF))

    header = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", header)
            + chunk(b"IDAT", raw) + chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [(1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)])
def test_native_unfilter_equals_pil_all_filter_types(filters):
    """ANY-filter grayscale PNGs decode through the native C unfilter
    byte-equal to PIL (sub/up/avg/paeth and a mixed cycle)."""
    import io

    from page_segmentation_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(sum(filters) + 11)
    img = rng.randint(0, 256, (57, 83), np.uint8)
    data = _png_gray_with_filters(img, filters)
    via_pil = np.asarray(Image.open(io.BytesIO(data)))
    assert np.array_equal(via_pil, img)  # the builder itself is valid
    got = image_io._decode_png_gray_fast(data)
    assert got is not None, "fast path must accept filtered rows"
    assert np.array_equal(got, img)
    # the public reader agrees too
    assert np.array_equal(image_io.decode_image_bytes(data, as_gray=True), img)


def test_native_unfilter_bilevel_filtered():
    """Filtered 1-bit PNGs reconstruct bit-equal through the packed
    reader (filters act on packed bytes; bpp=1 covers sub-byte depths)."""
    import io
    import struct
    import zlib
    import binascii

    from page_segmentation_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(3)
    img = (rng.rand(41, 70) < 0.4)
    packed = np.packbits(img, axis=1)
    h, stride = packed.shape
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):  # all rows "up"-filtered
        cur = packed[y].astype(np.int32)
        out.append(2)
        out.extend(((cur - prev) & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, payload):
        body = tag + payload
        return (struct.pack(">I", len(payload)) + body
                + struct.pack(">I", binascii.crc32(body) & 0xFFFFFFFF))

    header = struct.pack(">IIBBBBB", 70, h, 1, 0, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", header)
            + chunk(b"IDAT", zlib.compress(bytes(out), 6))
            + chunk(b"IEND", b""))
    via_pil = np.asarray(Image.open(io.BytesIO(data)))
    assert np.array_equal(via_pil, img)
    got = image_io._read_png_gray_rows(data, bit_depth=1)
    assert got is not None
    rows, w, hh = got
    assert (w, hh) == (70, 41)
    assert np.array_equal(rows, packed)


def test_indexed_fast_decode_equals_pil(tmp_path):
    """imsave_indexed files decode through the inflate+unfilter fast path
    byte-equal (labels AND palette) to the PIL P-mode decode."""
    rng = np.random.RandomState(5)
    labels = rng.randint(0, 4, (211, 173)).astype(np.uint8)
    palette = np.array([[255, 255, 255], [0, 0, 255], [0, 255, 0],
                        [128, 0, 0]], np.uint8)
    p = str(tmp_path / "idx.png")
    image_io.imsave_indexed(p, labels, palette)
    data = open(p, "rb").read()
    fast = image_io._decode_png_indexed_fast(data)
    import io as _io
    with Image.open(_io.BytesIO(data)) as im:
        assert im.mode == "P"
        pil_labels = np.asarray(im)
        pil_palette = np.asarray(im.getpalette(), np.uint8).reshape(-1, 3)
    if fast is None:
        from page_segmentation_tpu import native
        assert not native.available(), "fast path must handle PIL's files"
        pytest.skip("native library unavailable")
    np.testing.assert_array_equal(fast[0], pil_labels)
    np.testing.assert_array_equal(fast[1][: len(pil_palette)], pil_palette)
    # the public reader returns the same pair
    got = image_io.imread_labels(p)
    np.testing.assert_array_equal(got[0], labels)
    np.testing.assert_array_equal(got[1][: 4], palette)
