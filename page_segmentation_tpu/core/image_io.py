"""Image / file IO helpers.

Rebuild of the ``ocr4all.files`` helpers the reference imports
(reference dataset.py:14: ``imread``, ``imread_bin``, ``random_indices``,
``chunks``; reference render.py:8: ``split_filename``).  The semantic
contract is PIL's (goldens and parity tests froze PIL behavior); PNG files
additionally take a cv2 decode fast path (~2.7x on 300-DPI pages, measured
bit-identical for every PNG color mode — see _decode_png_cv2_bytes) because
the single-core PNG decode is the measured wall of the disk-corpus pipeline.
"""
from __future__ import annotations

import os
from random import shuffle
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

try:  # optional: present on some hosts, absent on others — PIL is the contract
    import cv2 as _cv2
except ImportError:  # pragma: no cover - environment-dependent
    _cv2 = None

# Large historical scans can exceed PIL's decompression-bomb default.
Image.MAX_IMAGE_PIXELS = None

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _native_unfilter_available() -> bool:
    """Whether the C PNG row-filter reconstruction is loadable (cached)."""
    global _HAVE_UNFILTER
    if _HAVE_UNFILTER is None:
        from .. import native

        lib = native.get_lib()
        _HAVE_UNFILTER = lib is not None and hasattr(lib, "ps_png_unfilter")
    return _HAVE_UNFILTER


_HAVE_UNFILTER: Optional[bool] = None


def _pil_luma(rgb: np.ndarray) -> np.ndarray:
    """PIL convert('L') exactly: fixed-point ITU-R 601-2 with round-half-up
    ((R*19595 + G*38470 + B*7471 + 0x8000) >> 16) — verified bit-equal to
    PIL on exhaustive random uint8 inputs."""
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)


def _decode_png_cv2_bytes(data) -> Optional[np.ndarray]:
    """Decode PNG bytes with cv2's native decoder; None = not applicable,
    use PIL.

    Returns the raw IMREAD_UNCHANGED array: 2-D uint8/uint16 for grayscale
    sources, 3/4-channel BGR(A) uint8 for color ones.  Restricted to PNG by
    header sniff: PNG decoding is lossless and deterministic so both
    libraries must agree (and measured so for modes L/I;16/RGB/RGBA/P/LA/1);
    JPEG IDCTs may legitimately differ by +-1 between decoders, so JPEGs
    keep the PIL path."""
    if _cv2 is None:
        return None
    data = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) else data
    if data.size < 8 or data[:8].tobytes() != _PNG_MAGIC:
        return None
    arr = _cv2.imdecode(data, _cv2.IMREAD_UNCHANGED)
    if arr is None or arr.ndim not in (2, 3):
        return None
    return arr


def _read_png_gray_rows(data, bit_depth: int,
                        probe_first_row: bool = False) -> Optional[Tuple[np.ndarray, int, int]]:
    """Shared fast-path PNG reader: (reconstructed rows (H, stride), W, H)
    for ANY non-interlaced grayscale PNG of ``bit_depth``; None for
    anything else — including malformed or truncated input (the general
    decoders take over and report real corruption with a meaningful
    error).  Filter-0 rows decode straight from the inflate; filtered
    rows (sub/up/avg/paeth — what real-world encoders emit) reconstruct
    through the native C unfilter (``native.png_unfilter``, gated
    byte-equal vs PIL on every filter type in tests/test_image_io.py);
    without the native lib, filtered files fall back to the general
    decoders.  ``probe_first_row`` does a bounded decompress of the first
    filter byte before committing to the full inflate (worth it for 8-bit
    pages; bilevel streams are tiny)."""
    import struct
    import zlib

    if isinstance(data, np.ndarray):
        data = data.tobytes()
    if len(data) < 8 or data[:8] != _PNG_MAGIC:
        return None
    try:
        pos = 8
        w = h = None
        idat = []
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            payload = data[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if tag == b"IHDR":
                w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", payload)
                if (depth, color_type, comp, filt, interlace) != (
                        bit_depth, 0, 0, 0, 0):
                    return None
            elif tag == b"IDAT":
                idat.append(payload)
            elif tag == b"IEND":
                break
        if w is None or not idat:
            return None
        stream = b"".join(idat)
        if probe_first_row:
            head = zlib.decompressobj().decompress(stream[: 1 << 14], 1)
            if not head or head[0] > 4:  # not a valid PNG filter byte
                return None
            if head[0] != 0 and not _native_unfilter_available():
                # a filtered first row without the C unfilter: bail on
                # the 1-byte probe so the general decoder's inflate is
                # the only full one (this path would otherwise inflate
                # the whole stream just to discover it must fall back)
                return None
        stride = (w * bit_depth + 7) // 8
        raw = zlib.decompress(stream)
        if len(raw) != h * (stride + 1):
            return None
        rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
        if rows[:, 0].any():  # filtered rows: native C reconstruction
            from .. import native

            pixels = native.png_unfilter(rows, bpp=1)
            if pixels is None:  # no lib / bad filter byte: general path
                return None
            return pixels, int(w), int(h)
        return np.ascontiguousarray(rows[:, 1:]), int(w), int(h)
    except Exception:  # malformed/truncated: fall back, never raise
        return None


def _write_png_gray(path, packed_rows: np.ndarray, w: int, bit_depth: int,
                    level: int) -> None:
    """Shared fast-path PNG writer: non-interlaced grayscale, filter-0
    rows (standard PNG any decoder reads)."""
    import struct
    import zlib

    h = packed_rows.shape[0]
    rows = np.zeros((h, packed_rows.shape[1] + 1), np.uint8)  # filter 0
    rows[:, 1:] = packed_rows
    header = struct.pack(">IIBBBBB", w, h, bit_depth, 0, 0, 0, 0)
    with open(str(path), "wb") as f:
        f.write(_PNG_MAGIC)
        f.write(_png_chunk(b"IHDR", header))
        f.write(_png_chunk(b"IDAT", zlib.compress(rows.tobytes(), level)))
        f.write(_png_chunk(b"IEND", b""))


def _decode_png_gray_fast(data) -> Optional[np.ndarray]:
    """Decode ANY non-interlaced 8-bit grayscale PNG straight from the
    zlib stream: filter-0 rows need no reconstruction (~6 ms for a
    300-DPI A4 page vs ~9-15 through the general decoders on this host);
    filtered rows reconstruct via the native C unfilter at ~the same
    speed.  Returns None for anything else (other modes, malformed
    input, filtered rows without the native lib) — the general decoders
    take over, pixels identical either way (tests/test_image_io.py)."""
    got = _read_png_gray_rows(data, bit_depth=8, probe_first_row=True)
    return got[0] if got is not None else None


def imsave_gray_fast(path, image: np.ndarray, level: int = 1) -> None:
    """Write an 8-bit grayscale PNG with filter-0 rows (standard PNG any
    decoder reads; pixels identical to imsave's).  Pairs with
    :func:`_decode_png_gray_fast`: the recommended layout for
    throughput-critical grayscale corpora — scan pages are mostly paper,
    so the filterless stream still compresses well and reads back with a
    single inflate, no per-row unfilter."""
    arr = _coerce_uint8(np.asarray(image))
    if arr.ndim != 2:
        raise ValueError(f"imsave_gray_fast takes (H, W) grayscale, got {arr.shape}")
    _write_png_gray(path, arr, arr.shape[1], bit_depth=8, level=level)


def decode_image_bytes(data: bytes, as_gray: bool = False) -> np.ndarray:
    """Decode in-memory image bytes (HTTP bodies, buffers) with the same
    fast path + contract as imread."""
    arr = _decode_png_gray_fast(data)
    if arr is not None:
        return arr if as_gray else np.stack([arr] * 3, axis=-1)
    arr = _decode_png_cv2_bytes(data)
    if arr is not None:
        if as_gray:
            if arr.ndim == 3:
                if arr.dtype == np.uint8:
                    return _pil_luma(arr[..., 2::-1])  # BGR(A) -> RGB luma
                arr = None  # 16-bit color: rare; keep the PIL conversion
            elif arr.dtype == np.uint8:
                return arr
            elif arr.dtype == np.uint16:
                return (arr // 257).astype(np.uint8)
            else:
                arr = None
        else:
            if arr.ndim == 3 and arr.dtype == np.uint8:
                return np.ascontiguousarray(arr[..., 2::-1])  # drop alpha, BGR->RGB
            if arr.ndim == 2 and arr.dtype == np.uint8:
                return np.stack([arr] * 3, axis=-1)
            arr = None  # 16-bit sources: PIL defines the 8-bit downconvert
    import io

    with Image.open(io.BytesIO(data)) as im:
        if as_gray:
            if im.mode not in ("L", "I;16", "I"):
                im = im.convert("L")
            arr = np.asarray(im)
            if arr.dtype != np.uint8:
                # scale by the dtype range, not the per-image max: the same
                # physical intensity must map to the same uint8 value on
                # every page (content-dependent scaling breaks the fixed
                # binarization threshold downstream)
                if arr.dtype == np.uint16:
                    arr = (arr // 257).astype(np.uint8)
                else:  # 32-bit 'I' mode and friends
                    arr = np.clip(arr.astype(np.float64) / 257.0, 0, 255).astype(np.uint8)
            return arr
        return np.asarray(im.convert("RGB"))


def imread(path, as_gray: bool = False) -> np.ndarray:
    """Read an image as uint8; grayscale (H, W) when ``as_gray``."""
    with open(str(path), "rb") as f:
        return decode_image_bytes(f.read(), as_gray=as_gray)


def imread_rgb(path) -> np.ndarray:
    return imread(path, as_gray=False)


def decode_labels_bytes(data: bytes) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(labels, palette) for in-memory palette-mode PNG bytes; None for
    anything else (non-PNG, non-'P' mode, malformed input) — callers
    fall back to :func:`decode_image_bytes` on the SAME bytes, avoiding
    a second file read."""
    import io

    if len(data) < 8 or data[:8] != _PNG_MAGIC:
        return None
    fast = _decode_png_indexed_fast(data)
    if fast is not None:
        return fast
    try:
        with Image.open(io.BytesIO(data)) as im:
            if im.mode != "P":
                return None
            labels = np.asarray(im)
            flat = im.getpalette()
    except Exception:  # malformed: the general decoders report it
        return None
    if flat is None or len(flat) % 3:  # PIL may return no/odd palette
        return None
    palette = np.asarray(flat, np.uint8).reshape(-1, 3)
    return labels, palette


def _decode_png_indexed_fast(data) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(labels, palette) straight from a palette PNG's zlib stream.

    An indexed PNG's rows are packed index bytes exactly like grayscale,
    so the same inflate + native unfilter applies, plus a vectorized
    expansion for the sub-byte depths imsave_indexed emits (a 3-class
    A4 label map is depth-2: ~1/4 the inflate output).  PIL's general
    P-mode decode measured ~40 ms for a 300-DPI A4 prediction mask vs
    single-digit ms here, and the prediction-PNG decode is the dominant
    cost of the page-segmentation stage.  None for anything else
    (non-palette types, malformed input, filtered rows without the
    native lib); equality vs the PIL path is gated in
    tests/test_image_io.py."""
    import struct
    import zlib

    if isinstance(data, np.ndarray):
        data = data.tobytes()
    if len(data) < 8 or data[:8] != _PNG_MAGIC:
        return None
    try:
        pos = 8
        w = h = None
        plte = None
        idat = []
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            payload = data[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if tag == b"IHDR":
                w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", payload)
                if (color_type, comp, filt, interlace) != (3, 0, 0, 0) \
                        or depth not in (1, 2, 4, 8):
                    return None
            elif tag == b"PLTE":
                plte = payload
            elif tag == b"IDAT":
                idat.append(payload)
            elif tag == b"IEND":
                break
        if w is None or plte is None or not idat or len(plte) % 3:
            return None
        stream = b"".join(idat)
        if not _native_unfilter_available():
            # without the C unfilter only filter-0 rows can proceed:
            # probe the first filter byte (1-byte decompress) instead of
            # inflating the whole stream before the inevitable fallback
            head = zlib.decompressobj().decompress(stream[: 1 << 14], 1)
            if not head or head[0] != 0:
                return None
        stride = (w * depth + 7) // 8
        raw = zlib.decompress(stream)
        if len(raw) != h * (stride + 1):
            return None
        rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
        palette = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        if rows[:, 0].any():  # filtered rows: native C reconstruction
            from .. import native

            packed = native.png_unfilter(rows, bpp=1)
            if packed is None:
                return None
        else:
            packed = np.ascontiguousarray(rows[:, 1:])
        if depth == 8:
            return packed, palette
        # sub-byte depths (imsave_indexed's layout for <= 16 classes)
        from .. import native

        labels = native.unpack_indices(packed, w, depth)
        if labels is not None:  # one read, one write in C
            return labels, palette
        # no native lib: MSB-first expansion via k strided stores (the
        # broadcast (H, stride, k) gather formulation measured 20 ms/
        # A4-page where these full-array shift+mask passes take ~5)
        k = 8 // depth
        mask = np.uint8((1 << depth) - 1)
        expanded = np.empty((h, stride * k), np.uint8)
        for i in range(k):
            np.bitwise_and(packed >> ((k - 1 - i) * depth), mask,
                           out=expanded[:, i::k])
        return np.ascontiguousarray(expanded[:, :w]), palette
    except Exception:  # malformed/truncated: the general decoder reports it
        return None


def imread_labels(path) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(labels, palette) for a palette-mode PNG; None for anything else.

    The predict stage writes its color-mask product as an indexed PNG
    (:func:`imsave_indexed`), so the page-segmentation consumer can skip
    the RGB expansion entirely: PIL hands back the raw palette indices
    (~3x less inflate than an RGB encode of the same page, and no
    3-byte/px gather), and downstream label selection becomes a byte
    compare.  Any non-PNG or non-'P'-mode source returns None — callers
    fall back to :func:`imread_rgb`, whose decoded pixels are identical
    (``palette[labels]``, gated in tests/test_image_io.py).
    """
    with open(str(path), "rb") as f:
        data = f.read()
    return decode_labels_bytes(data)


def imread_bin(path, binarize: bool = True, threshold: int = 128) -> np.ndarray:
    """Read a binarized image as 0/255 uint8 (white background, black ink)."""
    gray = imread(path, as_gray=True)
    if not binarize:
        return gray
    return np.where(gray >= threshold, np.uint8(255), np.uint8(0))


def _coerce_uint8(image: np.ndarray) -> np.ndarray:
    image = np.asarray(image)
    if image.dtype == bool:
        image = image.astype(np.uint8) * 255
    elif image.dtype != np.uint8:
        image = np.clip(image, 0, 255).astype(np.uint8)
    return image


def encode_png(image: np.ndarray) -> bytes:
    """PNG-encode an array (uint8 gray or RGB) — cv2 fast path (9.5x PIL
    at trio scale), PIL fallback.  Decoded pixels are identical either way;
    the *bytes* differ between encoders."""
    image = _coerce_uint8(image)
    if _cv2 is not None and (
        image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 3)
    ):
        data = image if image.ndim == 2 else np.ascontiguousarray(image[..., ::-1])
        ok, encoded = _cv2.imencode(".png", data, [_cv2.IMWRITE_PNG_COMPRESSION, 1])
        if ok:
            return encoded.tobytes()
    import io

    buf = io.BytesIO()
    Image.fromarray(image).save(buf, format="PNG")
    return buf.getvalue()


def imsave(path, image: np.ndarray) -> None:
    """Write an image; PNGs take the cv2 encode fast path (encode_png —
    the trio writes are 3 encodes/page on the host).  Anything that
    freezes file bytes must pin one encoder (imsave_pil)."""
    if str(path).lower().endswith(".png"):
        with open(str(path), "wb") as f:
            f.write(encode_png(image))
        return
    Image.fromarray(_coerce_uint8(image)).save(path)


def imsave_indexed(path, labels: np.ndarray, palette: np.ndarray) -> None:
    """Write a label map as an indexed (paletted) PNG.

    Used for the ``color`` mask product when the caller already holds the
    label map: any conforming decoder (cv2, PIL ``convert('RGB')``)
    recovers RGB pixels identical to encoding ``palette[labels]``, at one
    third the bytes through zlib (flat-color content encodes ~3x faster
    and smaller than the RGB fast path).  Falls back to RGB imsave for
    non-PNG extensions, which cannot carry a palette.
    """
    labels = np.ascontiguousarray(labels)
    palette = np.asarray(palette, np.uint8)
    if labels.dtype != np.uint8 or not str(path).lower().endswith(".png"):
        imsave(path, palette[labels])
        return
    # in-module encoder: filter-0 rows at zlib level 1, at the SMALLEST
    # legal palette bit depth (standard PNG any decoder reads).  PIL's
    # P-mode save (level 6 + adaptive filters) encoded ~3x slower AND its
    # dense 8-bit stream inflated ~25 ms/A4-page on read; a 3-class label
    # map is depth-2 here (2 bits/px, ~1/4 the inflate output), which the
    # fast reader expands vectorized.  Decoded pixels identical through
    # every path (tests/test_colors.py, test_image_io.py).
    import struct
    import zlib

    h, w = labels.shape
    n_entries = max(len(palette), int(labels.max()) + 1 if labels.size else 1)
    depth = next(d for d in (1, 2, 4, 8) if n_entries <= 1 << d)
    if depth == 8:
        packed = labels
    else:
        from .. import native

        packed = native.pack_indices(labels, depth)  # one read, one write
        if packed is None:  # no native lib: strided full-array passes
            k = 8 // depth  # pixels per byte, MSB-first (the PNG bit order)
            pad_w = (-w) % k
            padded = (np.pad(labels, ((0, 0), (0, pad_w)))
                      if pad_w else labels)
            packed = np.zeros((h, padded.shape[1] // k), np.uint8)
            for i in range(k):
                np.bitwise_or(packed,
                              padded[:, i::k] << ((k - 1 - i) * depth),
                              out=packed)
    rows = np.zeros((h, packed.shape[1] + 1), np.uint8)
    rows[:, 1:] = packed
    header = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    with open(str(path), "wb") as f:
        f.write(_PNG_MAGIC)
        f.write(_png_chunk(b"IHDR", header))
        f.write(_png_chunk(b"PLTE", palette.tobytes()))
        f.write(_png_chunk(b"IDAT", zlib.compress(rows.tobytes(), 1)))
        f.write(_png_chunk(b"IEND", b""))


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def imsave_bilevel(path, binary: np.ndarray) -> None:
    """Write a binarized page as a TRUE 1-bit PNG.

    Binarized images are 1-bit content; storing them as 8-bit grayscale
    makes every later read inflate 8x the bytes (measured 38 -> 14 ms per
    300-DPI A4 decode on this host, ~20x smaller files).  Reading back
    through :func:`imread_bin` / :func:`imread` is bit-equal to the 0/255
    uint8 encoding — both decoders expand bilevel PNGs to 0/255
    (tests/test_image_io.py) — so this is the recommended on-disk layout
    for the reference's pre-binarized dataset directories
    (reference README.md:46-108).

    The encoder is in-module (filter-0 rows, MSB-first bits, standard
    PNG any decoder reads) so :func:`imread_bilevel_packed` can hand the
    packed rows straight back without the 8.7 M-pixel bit expansion —
    the expansion, not the inflate, is where a bilevel decode spends its
    time on this host (~12 of 14 ms/page).
    """
    arr = np.asarray(binary)
    packed = np.packbits(arr != 0, axis=-1)  # MSB-first: the PNG bit order
    _write_png_gray(path, packed, arr.shape[1], bit_depth=1, level=6)


def imread_bilevel_packed(path) -> Optional[Tuple[np.ndarray, int]]:
    """(packed_rows (H, ceil(W/8)) uint8 MSB-first, W) for a bilevel
    filter-0 PNG (the :func:`imsave_bilevel` layout); None for anything
    else, INCLUDING malformed/truncated files — callers fall back to the
    expanding decoders, which report real corruption meaningfully.

    Bit 1 = white paper, bit 0 = ink (PNG grayscale: 0 is black), so
    ``ink = bit == 0`` — the `< 128` threshold contract on 0/255 pixels.
    Decoding to packed rows costs ~3 ms/A4-page vs ~14 ms through the
    expanding path: zlib inflates ~1.1 MB instead of touching 8.7 MB.
    """
    try:
        with open(str(path), "rb") as f:
            data = f.read()
    except OSError:
        return None
    got = _read_png_gray_rows(data, bit_depth=1)
    if got is None:
        return None
    rows, w, _h = got
    return rows, w


def imsave_pil(path, image: np.ndarray) -> None:
    """imsave pinned to the PIL encoder — for generators whose output bytes
    are checked in and byte-compared on hosts with or without cv2
    (tests/golden_corpus/make_corpus.py)."""
    Image.fromarray(_coerce_uint8(image)).save(path)


def split_filename(path) -> Tuple[str, str, str]:
    """Split a path into (directory, basename-without-extension, extension)."""
    directory, name = os.path.split(str(path))
    base, ext = os.path.splitext(name)
    return directory, base, ext.lstrip(".")


def random_indices(collection: Sequence) -> List[int]:
    indices = list(range(len(collection)))
    shuffle(indices)
    return indices


def chunks(items: Sequence, n: int) -> Iterable[Sequence]:
    """Yield successive n-sized chunks."""
    for i in range(0, len(items), n):
        yield items[i : i + n]


def glob_all(patterns: Iterable[str]) -> List[str]:
    """Expand a list of shell glob patterns into a sorted file list."""
    import glob as _glob

    out: List[str] = []
    for pattern in patterns:
        matched = sorted(_glob.glob(pattern))
        out.extend(matched if matched else [pattern])
    return out
