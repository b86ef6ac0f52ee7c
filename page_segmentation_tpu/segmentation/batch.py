"""Pipelined multi-page segmentation driver (the `page-segmentation` CLI).

The reference's segmentation stage is a strictly sequential per-page host
loop: decode the prediction PNG, morphology chain, contours, render
(reference pc_segmentation.py + the ocr4all_segmentation frontend).  On
this framework the same stage runs as a small pipeline:

* decode-ahead — a prefetch thread decodes batch i+1 while batch i is in
  flight, so PNG inflate overlaps the device morphology wait;
* indexed fast path — predictions written by our own predict stage are
  palette PNGs (core/image_io.imsave_indexed); ``imread_labels`` hands
  back raw indices (~2x cheaper than the RGB decode) and label selection
  becomes a byte compare (find_segments_indexed);
* device morphology — the char_height-sized close/open/dilate chain of
  the text-contours mode dispatches ONE batched XLA program per page
  shape (device_morph.py), 1-bit masks on the link, instead of ~132 ms
  of host cv2 per page (round-3 measurement).

Every path is equality-gated against the per-page host chain
(tests/test_segmentation_batch.py); outputs are identical files.
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.colors import ColorMap, exact_color_mask
from ..core.image_io import split_filename
from .pc_segmentation import (
    find_segments,
    find_segments_indexed,
    get_text_contours_batch,
)
from .render import render_morphological, render_regions, render_xycut


class PageSegmenter:
    """Segment prediction PNGs into region masks (+ optional PAGE-XML).

    ``backend`` controls the text-contours morphology placement: "host"
    (and "auto", currently its alias) runs the native bit-packed chain
    (ps_bitmorph_chain; cv2/scipy composition as fallback), "device"
    dispatches the batched XLA program (device_morph.py).  Measured on
    the tunneled single chip, the host chain wins end-to-end — the
    device round-trip moves ~2.2 MB/page over a link that swings
    5-30 MB/s, while the bit-packed host chain costs ~50 ms/page with no
    link exposure (bench_runs/r4_segmentation.json records both) — so
    "auto" resolves to host; the device path stays equality-gated and
    selectable for hosts where the link economics differ.  XY-cut mode
    is always host (its per-page cost is ~3 ms — not worth a dispatch).
    """

    def __init__(
        self,
        color_map: ColorMap,
        resize_height: int,
        text_contours: bool,
        output_dir: str,
        extension: str = "png",
        xml_output_dir: Optional[str] = None,
        backend: str = "auto",
        batch_size: int = 8,
    ):
        self.color_map = color_map
        self.resize_height = resize_height
        self.text_contours = text_contours
        self.output_dir = output_dir
        self.extension = extension
        self.xml_output_dir = xml_output_dir
        self.batch_size = max(1, int(batch_size))
        self._device = None
        if text_contours and backend == "device":
            from .device_morph import TextRegionMorphDevice

            self._device = TextRegionMorphDevice()

    # ------------------------------------------------------------- per page
    def _load(self, path: str):
        # one file read: try the indexed decode on the bytes, fall back
        # to the RGB decode on the SAME bytes (re-reading the file cost a
        # second disk+header pass per RGB page in the decode-bound stage)
        from ..core.image_io import decode_image_bytes, decode_labels_bytes

        with open(path, "rb") as f:
            data = f.read()
        got = decode_labels_bytes(data)
        if got is not None:
            labels, palette = got
            return path, None, labels, palette
        return path, decode_image_bytes(data), None, None

    def _text_mask(self, image, labels, palette) -> np.ndarray:
        text = np.asarray(self.color_map.color_for_label("text"), np.uint8)
        if labels is not None:
            idxs = np.flatnonzero((palette == text).all(axis=1))
            if len(idxs) == 0:
                return np.zeros(labels.shape, bool)
            if len(idxs) == 1:
                return labels == idxs[0]
            # exact-color semantics: every palette slot holding the text
            # color counts (degenerate palettes can repeat colors)
            return np.isin(labels, idxs)
        return exact_color_mask(image, tuple(int(c) for c in text)) > 0

    def _segments(self, image, labels, palette, char_height: int):
        if labels is not None:
            return find_segments_indexed(
                labels.shape[0], labels, palette, char_height,
                self.resize_height, self.color_map,
                only_images=self.text_contours,
            )
        return find_segments(
            image.shape[0], image, char_height, self.resize_height,
            self.color_map, only_images=self.text_contours,
        )

    # ------------------------------------------------------------ per batch
    def _start_batch(self, loaded, chs: List[int]):
        """Begin a batch: in text-contours mode with a device backend,
        pack/upload/enqueue the morphology chain NOW (asynchronously) so
        the device round-trip overlaps the previous batch's contours,
        render and the prefetch thread's decode."""
        masks = handles = None
        if self.text_contours:
            masks = [self._text_mask(img, lab, pal)
                     for (_, img, lab, pal) in loaded]
            if self._device is not None:
                from .device_morph import morph_kernels

                # one dispatch per page-shape group; mixed char_heights
                # ride along as the program's assignment vector (see
                # device_morph.py)
                handles = []
                groups = {}
                for i, mask in enumerate(masks):
                    groups.setdefault(mask.shape, []).append(i)
                for idxs in groups.values():
                    handles.append((idxs, self._device.dispatch(
                        np.stack([masks[i] for i in idxs]),
                        [morph_kernels(chs[i]) for i in idxs])))
        return loaded, chs, masks, handles

    def _finish_batch(self, started):
        loaded, chs, masks, handles = started
        contours: List[Optional[list]] = [None] * len(loaded)
        if self.text_contours:
            if handles is not None:
                from .pc_segmentation import contours_from_region_mask

                for idxs, handle in handles:
                    regions = self._device.collect(handle)  # uint8 0/255
                    for j, i in enumerate(idxs):
                        contours[i] = contours_from_region_mask(regions[j])
            else:
                # the host path takes the mask list directly — stacking
                # same-shape runs into (N, H, W) arrays copied ~8.7 MB
                # per A4 page for nothing (the chain packs per page)
                contours = get_text_contours_batch(masks, chs)
        for idx, (path, img, lab, pal) in enumerate(loaded):
            texts, images = self._segments(img, lab, pal, chs[idx])
            shape = img.shape[:2] if img is not None else lab.shape[:2]
            yield (path,) + tuple(
                self._finish_page(path, shape, texts, images, contours[idx]))

    def _finish_page(self, path, shape, segments_text, segments_image, contours):
        if self.text_contours:
            regions, method = contours, render_morphological
        else:
            regions, method = segments_text, render_xycut
        render_regions(
            self.output_dir, self.extension, shape, path, self.color_map,
            method, regions, segments_image,
        )
        if self.xml_output_dir:
            from ..pagexml.xml_gen import save_pagexml

            os.makedirs(self.xml_output_dir, exist_ok=True)
            page_name = split_filename(path)[1]
            save_pagexml(
                os.path.join(self.xml_output_dir, page_name + ".xml"),
                os.path.basename(path),
                shape,
                text_regions=regions,
                image_regions=segments_image,
            )
        return regions, segments_image

    # ----------------------------------------------------------------- run
    def run(self, pages: Sequence[Tuple[str, int]]):
        """Process [(prediction_path, char_height), ...]; yields
        (path, regions, image_segments) per page, in order.

        Three-way overlap: the prefetch thread decodes batch i+1, the
        device runs batch i's morphology (dispatched before batch i-1 is
        finished), and the main thread finishes batch i-1 (download,
        contours, render).  On a 1-core host only the device/link time
        truly overlaps — which is exactly the time the dispatch-early
        structure hides."""
        pages = list(pages)
        batches = [pages[i : i + self.batch_size]
                   for i in range(0, len(pages), self.batch_size)]
        if not batches:
            return
        with ThreadPoolExecutor(1) as prefetch:

            def load_batch(batch):
                return [self._load(path) for path, _ in batch]

            pending = prefetch.submit(load_batch, batches[0])
            started_prev = None
            for i, batch in enumerate(batches):
                loaded = pending.result()
                if i + 1 < len(batches):
                    pending = prefetch.submit(load_batch, batches[i + 1])
                started = self._start_batch(loaded, [ch for _, ch in batch])
                if started_prev is not None:
                    yield from self._finish_batch(started_prev)
                started_prev = started
            yield from self._finish_batch(started_prev)
