"""Raw-corpus streaming prediction: the fused pipeline as a user feature.

The reference's predict loop decodes, normalizes, and forwards one page
at a time on the host (reference predictor.py:27-30, dataset.py:131-150).
``RawCorpusPredictor`` runs the same contract — raw full-resolution page
files in, the color/overlay/inverted trio out — through the
ThroughputPredictor fast path (inference/pipeline.py): pages grouped by
(shape, line height), host box-decimation, one uint8 upload / one packed
download per batch, device-fused normalize+forward+argmax, 3-stage
overlap.  This is what `cli predict --pipeline` uses; the per-page
`Predictor.predict` path remains the bit-parity reference surface.

Outputs are at the normalized (line-height-rescaled) page scale — the
reference's default too (high_res_output is the per-page path's flag).
"""
from __future__ import annotations

import os
import threading
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.image_io import imread, imread_bilevel_packed, imread_bin, imsave
from ..ops.threshold import binarize_into, otsu_threshold


@dataclass
class RawPage:
    """One corpus entry: raw image file + binarized file + line height.

    ``binary_path=None`` streams the page binary-free: the predictor
    binarizes the decoded image itself (its ``binarize`` mode), the same
    fallback the per-page path and the reference use when no separate
    binarized file exists (reference dataset.py:172) — and one fewer PNG
    decode per page on the host.
    """

    image_path: str
    binary_path: Optional[str]
    line_height_px: int
    output_name: Optional[str] = None

    @property
    def name(self) -> str:
        return self.output_name or os.path.basename(self.image_path)


def pick_host_decimate(scale: float, cap: int = 8) -> int:
    """Largest decimation whose grid stays at/above the normalized grid
    (so the device cubic resample only ever downsamples — no detail the
    reference path would use is lost): floor(1/scale), capped."""
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    return max(1, min(cap, int(1.0 / scale)))


class RawCorpusPredictor:
    """Group raw pages by (shape, line height) and stream each group
    through a ThroughputPredictor.

    ``classifier``: a PixelClassifier holding the model — any family: the
    grayscale FCNs stream with the invert+/255 device normalize; the
    pretrained RGB encoder families (mobilenet/resnet/effnet) replicate
    the inverted page to 3 channels and apply their Keras preprocess
    twin on device (registry.preprocess_mode), so the link still carries
    ONE uint8 plane per page.  int8 serving remains grayscale-only.
    ``window`` bounds host memory: at most two ``window``-sized slices of
    full-resolution pages are resident at once (the slice being predicted
    plus the next one decoding on the prefetch thread).
    """

    def __init__(
        self,
        classifier,
        palette: np.ndarray,
        target_line_height: int = 6,
        batch_size: int = 16,
        window: Optional[int] = None,
        download: str = "packed",
        cc_vote: bool = False,
        int8: bool = False,
        compute_dtype=None,
        binarize: str = "threshold",
        reuse_output_buffers: bool = False,
    ):
        if classifier.rgb and int8:
            raise ValueError("int8 supports the grayscale FCN families only")
        self.classifier = classifier
        self.palette = np.ascontiguousarray(palette, np.uint8)
        self.target_line_height = target_line_height
        self.batch_size = batch_size
        self.window = window or 4 * batch_size
        if download == "packed" and getattr(classifier, "n_classes", 0) > 4:
            # the 2-bit packed download holds <= 4 classes; fall back to
            # the raw class map so wide-class models stream too
            download = "pred"
        self.download = download
        self.cc_vote = cc_vote
        self.int8 = int8
        if binarize not in ("threshold", "otsu"):
            raise ValueError(
                f"binarize must be 'threshold' or 'otsu', got {binarize!r}"
            )
        # applied to pages with binary_path=None: 'threshold' = global 128
        # (byte-equal to the per-page loader fallback / imread_bin),
        # 'otsu' = per-page Otsu (cv2 convention: strictly-above-t -> 255)
        self.binarize = binarize
        if compute_dtype is None:
            import jax.numpy as jnp

            compute_dtype = jnp.bfloat16
        self.compute_dtype = compute_dtype
        # opt-in trio-buffer reuse (see ThroughputPredictor): each yielded
        # trio is then valid only until a few batches later — callers that
        # consume-and-drop (benchmarks, streaming writers) save the fresh
        # 3x1.1 MB/page allocations; the library default keeps copies
        self.reuse_output_buffers = bool(reuse_output_buffers)
        self._predictors = {}
        self._spare_ring: Optional[RawCorpusPredictor._SliceRing] = None
        # created eagerly: a lazily-created lock is itself a race (two
        # threads can each install a different Lock and both pop the ring)
        self._ring_lock = threading.Lock()

    # ------------------------------------------------------------- grouping
    @staticmethod
    def _probe_shape(path: str) -> Tuple[int, int]:
        from PIL import Image

        with Image.open(path) as im:
            return im.height, im.width

    def group(self, pages: Sequence[RawPage]):
        """[(key, members)] with key = (H, W, line_height_px); shapes come
        from the image headers (no full decode)."""
        groups = {}
        for page in pages:
            h, w = self._probe_shape(page.image_path)
            groups.setdefault((h, w, page.line_height_px), []).append(page)
        return list(groups.items())

    def _predictor_for(self, key, packed_binary: bool = False):
        key = key + (packed_binary,)
        if key not in self._predictors:
            from .pipeline import ThroughputPredictor

            h, w, line_height, _ = key
            scale = self.target_line_height / line_height
            arch = self.classifier.architecture
            self._predictors[key] = ThroughputPredictor(
                self.classifier.module,
                self.classifier.variables,
                self.palette,
                (h, w),
                scale,
                host_decimate=pick_host_decimate(scale),
                stride_factor=arch.stride_factor,
                compute_dtype=self.compute_dtype,
                download=self.download,
                cc_vote=self.cc_vote,
                int8=self.int8,
                preprocess_mode=arch.preprocess_mode,
                packed_binary=packed_binary,
                reuse_output_buffers=self.reuse_output_buffers,
            )
        return self._predictors[key]

    # -------------------------------------------------------------- running
    class _SliceRing:
        """Two reusable (images, binaries) window buffer pairs — one being
        predicted, one being decoded into by the prefetch thread.  Fresh
        window-sized arrays every slice first-touch ~2 x window x H x W of
        new memory each time, which on this class of host runs at
        cold-page-fault speed and measured 3.5x the actual decode cost
        (197 vs 57 ms/page); steady-state reuse pays the fault once.

        Each active run() generator holds an EXCLUSIVE ring (two
        overlapping run() calls can never hand each other's in-flight
        pixels out); when a run finishes, its ring parks on the predictor
        so the next sequential run() reuses the already-faulted buffers —
        re-faulting a fresh ring costs ~20 s per window pair of 300-DPI
        A4 pages on this host class, measured 5x the warm decode itself."""

        def __init__(self):
            self._pairs = [None, None]
            self._turn = 0

        def take(self, h: int, w: int, n: int, wb: Optional[int] = None):
            """(images (n, h, w), binaries (n, h, wb or w)): wb narrows
            the binary buffer to the packed-bit stride."""
            wb = w if wb is None else wb
            pair = self._pairs[self._turn % 2]
            if (pair is None or pair[0].shape[1:] != (h, w)
                    or pair[1].shape[1:] != (h, wb) or pair[0].shape[0] < n):
                pair = (np.empty((n, h, w), np.uint8), np.empty((n, h, wb), np.uint8))
                self._pairs[self._turn % 2] = pair
            self._turn += 1
            return pair[0][:n], pair[1][:n]

    def _take_ring(self) -> "RawCorpusPredictor._SliceRing":
        """Pop the parked ring (warm buffers) or make a fresh one; the
        caller owns it exclusively until _return_ring."""
        with self._ring_lock:
            ring, self._spare_ring = self._spare_ring, None
        return ring or self._SliceRing()

    def _return_ring(self, ring) -> None:
        """Park one ring for the next run(); extras from concurrent runs
        are dropped (bounded memory: at most one idle ring is retained)."""
        with self._ring_lock:
            if self._spare_ring is None:
                self._spare_ring = ring

    def _load_slice(self, ring, members: List[RawPage], h: int, w: int,
                    packed: bool = False):
        images, binaries = ring.take(h, w, len(members),
                                     wb=(w + 7) // 8 if packed else None)

        def load(i_page):
            i, page = i_page
            img = imread(page.image_path, as_gray=True)
            if img.shape != (h, w):
                raise ValueError(
                    f"{page.image_path}: shape {img.shape} changed between "
                    f"header probe and decode (expected {(h, w)})"
                )
            images[i] = img
            if packed:
                # bit rows straight from the bilevel PNG (~3 ms/A4-page vs
                # ~14 through the expanding decode; imsave_bilevel layout)
                got = imread_bilevel_packed(page.binary_path)
                if got is not None and got[0].shape[0] == h and got[1] == w:
                    binaries[i] = got[0]
                else:  # stray non-bilevel file in a packed corpus
                    gray = imread(page.binary_path, as_gray=True)
                    binaries[i] = np.packbits(gray >= 128, axis=-1)
            elif page.binary_path is not None:
                # raw grayscale, NOT imread_bin's 0/255 rewrite: the only
                # consumer is the ink gather, whose `< 128` test on raw
                # gray equals `< 128` on the thresholded (>=128 -> 255)
                # image — skipping the full-page np.where saves ~6 ms/page
                # on this host (and is the identity for bilevel sources,
                # the recommended layout)
                binaries[i] = imread_bin(page.binary_path, binarize=False)
            elif self.binarize == "otsu":
                # cv2 Otsu keeps strictly-above-t pixels -> >= t+1
                binarize_into(images[i], binaries[i], otsu_threshold(images[i]) + 1)
            else:
                binarize_into(images[i], binaries[i])

        if len(members) == 1:
            load((0, members[0]))
        else:
            # both decoders (cv2 fast path / PIL) release the GIL during
            # PNG decode; the shared pool parallelizes the slice load on
            # multi-core hosts
            from ..data.dataset import io_pool

            list(io_pool().map(load, enumerate(members)))
        return images, binaries

    def run(self, pages: Sequence[RawPage], output_dir: Optional[str] = None):
        """Yield (RawPage, color, overlay, inverted) per page, writing the
        trio PNGs when ``output_dir`` is given (reference layout:
        color/ overlay/ inverted/ subdirectories, output.py:20-41)."""
        from concurrent.futures import ThreadPoolExecutor

        if output_dir:
            for sub in ("color", "overlay", "inverted"):
                os.makedirs(os.path.join(output_dir, sub), exist_ok=True)
        ring = self._take_ring()  # exclusive: see _SliceRing docstring
        # bit-packed corpus mode: every page carries a binary file and the
        # first one reads as a bilevel filter-0 PNG (the imsave_bilevel
        # layout) — binaries then stay packed from disk to ink gather
        pages = list(pages)
        packed = bool(pages) and all(p.binary_path for p in pages) and (
            imread_bilevel_packed(pages[0].binary_path) is not None)
        try:
            for (h, w, line_height), members in self.group(pages):
                predictor = self._predictor_for((h, w, line_height),
                                                packed_binary=packed)
                slices = [
                    members[start : start + self.window]
                    for start in range(0, len(members), self.window)
                ]
                # decode the NEXT slice while the current one predicts (the
                # PNG decoders release the GIL, so on multi-core hosts the
                # decode rides a spare core; host residency becomes two
                # windows of full-resolution pages instead of one)
                with ThreadPoolExecutor(1) as loader:
                    pending = loader.submit(self._load_slice, ring, slices[0],
                                            h, w, packed)
                    for index, chunk in enumerate(slices):
                        images, binaries = pending.result()
                        if index + 1 < len(slices):
                            pending = loader.submit(
                                self._load_slice, ring, slices[index + 1],
                                h, w, packed
                            )
                        yield from self._run_slice(
                            predictor, chunk, images, binaries, output_dir
                        )
        finally:
            # runs when the generator is exhausted, closed, or collected
            self._return_ring(ring)

    def _run_slice(self, predictor, chunk, images, binaries, output_dir):
        done = 0
        for color, overlay, inverted in predictor.run(
            images, binaries, batch_size=self.batch_size
        ):
            for j in range(color.shape[0]):
                page = chunk[done + j]
                trio = (color[j], overlay[j], inverted[j])
                if output_dir:
                    for sub, mask in zip(("color", "overlay", "inverted"), trio):
                        imsave(os.path.join(output_dir, sub, page.name), mask)
                yield (page,) + trio
            done += color.shape[0]
