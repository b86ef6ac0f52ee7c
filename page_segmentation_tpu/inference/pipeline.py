"""Fully-fused on-device predict pipeline + throughput executor.

The reference splits predict across host numpy/skimage (line-height resize,
inversion — dataset.py:131-150), TF (forward), and host again (softmax,
argmax, mask rendering — network.py:248-260, output.py:44-60).  Here the
compute-heavy chain is one XLA program — resize -> invert -> normalize ->
conv net (bf16) -> argmax -> palette gather — and the host does only what
it is uniquely required for (image decode/decimation, PNG writes).

Transfer design (the TPU link is the bottleneck, not FLOPs):

* upload ONE uint8 array per batch: pages box-decimated by ``host_decimate``
  (PIL ``reduce`` — a few ms/page) so bytes shrink ~decimate^2 while the
  device cubic resample finishes the line-height normalization;
* the binarized image never crosses the link: overlay/inverted masks are
  ``color x ink-mask`` products, reconstructed on host from the downloaded
  color mask and the host-resident binary (nearest-gathered to the
  normalized scale, <1 ms/page);
* download ONE uint8 array per batch: the color mask.

A 3-stage thread pipeline (prep+upload / device compute / download+
reconstruct) overlaps link time with compute.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pad import round_up


def nearest_index_array(out_dim: int, in_dim: int) -> np.ndarray:
    coords = (np.arange(out_dim) + 0.5) * (in_dim / out_dim) - 0.5
    return np.clip(np.floor(coords + 0.5).astype(np.int64), 0, in_dim - 1)


def _device_normalize(out_h: int, out_w: int, pad_h: int, pad_w: int,
                      preprocess_mode: str = "gray"):
    """The fused pipeline's device preprocessing: cubic resample to the
    normalized shape, invert + family normalization, zero-pad to the
    bucket.  Returns NHWC (channel dim included).  Shared by the predict
    program and int8 calibration so the calibrated activation ranges see
    exactly the inference inputs.

    ``preprocess_mode='gray'`` is invert + /255 fused (dataset.py:137).
    The RGB encoder modes replicate the inverted page to 3 channels (the
    per-page path's GrayToRgb placement, classifier._prepare_input) and
    apply the family's Keras preprocess_input twin (registry.py modes:
    'caffe' ResNet50, 'tf' MobileNetV2, 'torch' EfficientNet); zero-pad
    comes AFTER preprocess, matching the per-page path's pad_to."""

    if preprocess_mode == "gray":

        def normalize(pages_u8):
            n = pages_u8.shape[0]
            img = pages_u8.astype(jnp.float32)
            img = jax.image.resize(img, (n, out_h, out_w), method="cubic")
            img = 1.0 - img / 255.0
            img = jnp.pad(img, ((0, 0), (0, pad_h - out_h), (0, pad_w - out_w)))
            return img[..., None]

        return normalize

    from ..models.registry import _make_preprocess

    pre = _make_preprocess(preprocess_mode, jnp)

    def normalize(pages_u8):
        n = pages_u8.shape[0]
        img = pages_u8.astype(jnp.float32)
        img = jax.image.resize(img, (n, out_h, out_w), method="cubic")
        # prepared-page convention: ink bright (prepare.py:76)
        inv = 255.0 - img
        x = pre(jnp.repeat(inv[..., None], 3, axis=-1))
        return jnp.pad(x, ((0, 0), (0, pad_h - out_h), (0, pad_w - out_w), (0, 0)))

    return normalize


def make_fused_calibrate(
    calibrate_module,
    normalized_shape: Tuple[int, int],
    stride_factor: int = 8,
    bucket_granularity: int = 1,
):
    """Jitted fn(params, pages_u8) -> 'amax' collection: one forward of the
    int8 calibration twin (models/quant.py) over device-normalized pages,
    recording per-conv input ranges for the quantized predict program."""
    out_h, out_w = normalized_shape
    pad_h = round_up(out_h, stride_factor * bucket_granularity)
    pad_w = round_up(out_w, stride_factor * bucket_granularity)
    normalize = _device_normalize(out_h, out_w, pad_h, pad_w)

    @jax.jit
    def calibrate(params, pages_u8):
        img = normalize(pages_u8)
        _, mutated = calibrate_module.apply(
            {"params": params}, img, mutable=["amax"]
        )
        return mutated["amax"]

    return calibrate


def make_fused_predict(
    module,
    normalized_shape: Tuple[int, int],
    stride_factor: int = 8,
    bucket_granularity: int = 1,
    compute_dtype=jnp.bfloat16,
    download: str = "color",
    cc_vote: bool = False,
    mesh=None,
    data_axis: str = "data",
    preprocess_mode: str = "gray",
):
    """Jitted fn(variables, pages_u8 (N, hd, wd), palette[, ink_packed]):
    device cubic resample to ``normalized_shape``, invert/normalize, pad to
    the bucket, forward, argmax.  ``download='color'`` returns the
    palette-gathered RGB mask (N, pad_h, pad_w, 3) uint8;
    ``download='pred'`` returns the raw class map (N, pad_h, pad_w) uint8 —
    3x fewer bytes over the link, with the palette gather done host-side;
    ``download='packed'`` packs 4 pixels/byte (2-bit classes,
    n_classes <= 4) — 12x fewer bytes.

    ``cc_vote`` adds the cc-majority post-processor on device (BASELINE
    "on-device connected-components + overlay" throughput config): the
    fused fn takes a 1-bit-packed ink mask (N, pad_h, pad_w//8) and the
    CC labeler + histogram vote run before the download.  ``cc_vote=True``
    (= ``"xla"``) uses the pure-XLA batched segmented-scan labeler, which
    keeps the 3-stage pipeline overlap (no Pallas call in the program —
    see ops/pallas_cc.cc_vote_batch_xla); ``cc_vote="pallas"`` uses the
    VMEM-resident Pallas kernel, whose download must be serialized on the
    tunneled runtime (tools/repro_pallas_download.py).

    ``mesh`` data-parallelizes the whole program over its ``data_axis``
    with ``shard_map`` (every stage is per-page independent, so the only
    communication is the initial scatter/final gather; N must be a
    multiple of the axis size — the ThroughputPredictor pads)."""
    out_h, out_w = normalized_shape
    pad_h = round_up(out_h, stride_factor * bucket_granularity)
    pad_w = round_up(out_w, stride_factor * bucket_granularity)
    cc_vote = "xla" if cc_vote is True else cc_vote
    normalize = _device_normalize(out_h, out_w, pad_h, pad_w, preprocess_mode)

    def core(variables, pages_u8, palette, ink_packed=None):
        img = normalize(pages_u8)
        logits = module.apply(variables, img.astype(compute_dtype))
        pred = jnp.argmax(logits, axis=-1)
        if cc_vote:
            from ..ops.pallas_cc import cc_vote_batch, cc_vote_batch_xla
            from .output import unpack_bits_device

            ink = unpack_bits_device(ink_packed)
            if cc_vote == "xla":
                pred = cc_vote_batch_xla(pred, ink, n_classes=logits.shape[-1])
            else:
                interpret = jax.default_backend() != "tpu"
                pred = cc_vote_batch(
                    pred, ink, n_classes=logits.shape[-1], interpret=interpret
                )
        if download == "packed":
            # 2 bits/class, 4 pixels/byte: the link carries 1/4 the bytes
            # of the raw class map (valid while n_classes <= 4)
            from .output import pack_classes_device

            return pack_classes_device(pred)
        if download == "pred":
            return pred.astype(jnp.uint8)
        return jnp.take(palette, jnp.clip(pred, 0, palette.shape[0] - 1), axis=0)

    if mesh is None:
        fused = jax.jit(core)
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        batch = P(data_axis)
        if cc_vote == "pallas":
            # check_vma=False: the Pallas labeler's out_shape carries no
            # varying-mesh-axes annotation, which strict shard_map rejects
            # (the XLA vote passes the strict check — no exemption there)
            sharded = shard_map(
                core, mesh=mesh,
                in_specs=(P(), batch, P(), batch), out_specs=batch,
                check_vma=False,
            )
            fused = jax.jit(lambda v, x, p, ink: sharded(v, x, p, ink))
        elif cc_vote:
            sharded = shard_map(
                core, mesh=mesh,
                in_specs=(P(), batch, P(), batch), out_specs=batch,
            )
            fused = jax.jit(lambda v, x, p, ink: sharded(v, x, p, ink))
        else:
            sharded = shard_map(
                lambda v, x, p: core(v, x, p), mesh=mesh,
                in_specs=(P(), batch, P()), out_specs=batch,
            )
            fused = jax.jit(sharded)

    fused.valid_shape = (out_h, out_w)
    fused.padded_shape = (pad_h, pad_w)
    return fused


class ThroughputPredictor:
    """Pipelined batch predictor for same-sized full-resolution pages.

    Produces, per page, the color/overlay/inverted uint8 RGB trio at the
    normalized scale (reference output contract, output.py:44-60).
    """

    def __init__(
        self,
        module,
        variables,
        palette: np.ndarray,
        page_shape: Tuple[int, int],
        scale: float,
        host_decimate: int = 8,
        stride_factor: int = 8,
        compute_dtype=jnp.bfloat16,
        download: str = "color",
        cc_vote: bool = False,
        mesh=None,
        data_axis: str = "data",
        int8: bool = False,
        reuse_output_buffers: bool = False,
        preprocess_mode: str = "gray",
        yield_pred: bool = False,
        packed_binary: bool = False,
    ):
        in_h, in_w = page_shape
        self.page_shape = page_shape
        self.host_decimate = host_decimate
        # default vote backend: the native host vote inside the overlapped
        # finish stage measured 142 median / 179 best pages/s vs the fused
        # device xla vote's 99/161 on the same chip (and ~0.9x of the
        # no-vote path best-to-best, vs 0.76x for the device vote) — the
        # device backends remain selectable by name
        self.cc_vote = "host" if cc_vote is True else cc_vote
        self.n_classes = int(getattr(module, "n_classes", len(palette)))
        if self.cc_vote == "host" and download == "color":
            # the host vote rewrites the class map, so the dispatch must
            # download classes, not rendered colors
            download = "packed" if self.n_classes <= 4 else "pred"
        if download == "packed" and self.n_classes > 4:
            raise ValueError(
                f"download='packed' carries 2-bit classes (n_classes <= 4); "
                f"this model has {self.n_classes} — use 'pred' or 'color'"
            )
        # yield_pred: batches come back as (pred, color, overlay, inverted)
        # — the serving engine needs the label map alongside the trio
        self.yield_pred = bool(yield_pred)
        if yield_pred and download == "color":
            raise ValueError(
                "yield_pred needs the class map on host — use "
                "download='packed' or 'pred', not 'color'"
            )
        self.download = download
        self.mesh = mesh
        self.data_axis = data_axis
        self._mesh_size = (
            dict(zip(mesh.axis_names, mesh.devices.shape))[data_axis] if mesh else 1
        )
        out_h = int(np.round(in_h * scale))
        out_w = int(np.round(in_w * scale))
        dec_h, dec_w = in_h // host_decimate, in_w // host_decimate
        self.decimated_shape = (dec_h, dec_w)
        self.int8 = bool(int8)
        self.preprocess_mode = preprocess_mode
        if int8 and preprocess_mode != "gray":
            raise ValueError("int8 supports the grayscale FCN families only")
        # opt-in trio-buffer reuse: each batch's color/overlay/inverted are
        # then views into per-instance buffers, valid only until the next
        # batch's _finish — fresh 54 MB/batch allocations page-fault for
        # ~120 ms on a 1-core host.  bench uses it; the library default
        # keeps independent arrays
        self.reuse_output_buffers = bool(reuse_output_buffers)
        self._trio_bufs = None
        self._ring_len = 4  # grown by run() for deeper in-flight windows
        self._calibrate_fn = None
        if int8:
            # int8 serving (models/quant.py): the predict program runs the
            # quantized twin; activation ranges calibrate on the first
            # batch of run() (one extra float forward, then frozen)
            from ..models.quant import twin_classes_for

            cal, module = twin_classes_for(module)
            self._calibrate_fn = make_fused_calibrate(
                cal, (out_h, out_w), stride_factor=stride_factor,
            )
        # "host": the dispatch itself carries no vote — the native C
        # union-find vote runs per page inside the (thread-overlapped)
        # finish stage, the reference's own placement (postprocess.py:9-26)
        device_vote = self.cc_vote if self.cc_vote in ("xla", "pallas") else False
        self.fused = make_fused_predict(
            module, (out_h, out_w),
            stride_factor=stride_factor, compute_dtype=compute_dtype,
            download=self.download, cc_vote=device_vote, mesh=mesh,
            data_axis=data_axis, preprocess_mode=preprocess_mode,
        )
        self.palette_np = np.asarray(palette, np.uint8)
        if not isinstance(variables, dict) or "params" not in variables:
            variables = {"params": variables}
        self.variables = variables
        self.palette_dev = jnp.asarray(palette)
        self.row_idx = nearest_index_array(out_h, in_h)
        self.col_idx = nearest_index_array(out_w, in_w)
        # packed_binary: run() receives binaries as MSB-first bit rows
        # (N, H, ceil(W/8)) — the imread_bilevel_packed layout — and the
        # ink gather reads bits directly (~125 K gathers) instead of an
        # 8.7 M-pixel expanded page per image
        self.packed_binary = bool(packed_binary)
        self._col_bytes = self.col_idx >> 3
        self._col_shift = (7 - (self.col_idx & 7)).astype(np.uint8)

    # ------------------------------------------------------------ host steps
    # native C kernels (ps_native.cpp) run the host stages GIL-free at
    # ~3x the PIL/numpy speed on the 1-core host; the PIL/numpy path
    # remains as the no-toolchain fallback
    def _put(self, arr: np.ndarray):
        """Place a host batch on the device(s): mesh mode pads the batch to
        a multiple of the data-axis size (zero pages, cropped in _finish)
        and scatters it across the mesh."""
        if self.mesh is None:
            return jax.device_put(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P

        pad = (-arr.shape[0]) % self._mesh_size
        if pad:
            arr = np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
        return jax.device_put(arr, NamedSharding(self.mesh, P(self.data_axis)))

    def _gather_ink_bits(self, packed: np.ndarray) -> np.ndarray:
        """Ink mask from bit-packed binaries (N, H, ceil(W/8)): sample the
        nearest grid directly in bit space (ink = bit 0 = PNG black, the
        `< 128` contract on 0/255 pixels)."""
        rows = packed[:, self.row_idx, :]                 # (N, oh, stride)
        window = rows[:, :, self._col_bytes]              # (N, oh, ow)
        return ((window >> self._col_shift) & 1) == 0

    def _prep(self, pages: np.ndarray, binaries: np.ndarray):
        """Decimate pages (box mean) + nearest-gather the ink mask."""
        from .. import native

        dec = native.decimate_u8(pages, self.host_decimate)
        if dec is not None:
            dec = dec[:, : self.decimated_shape[0], : self.decimated_shape[1]]
            if self.packed_binary:
                return self._put(dec), self._gather_ink_bits(binaries)
            ink = native.gather_ink(binaries, self.row_idx, self.col_idx)
            return self._put(dec), ink.astype(bool)

        from PIL import Image

        n = pages.shape[0]
        dec = np.empty((n,) + self.decimated_shape, np.uint8)
        ink = np.empty((n, len(self.row_idx), len(self.col_idx)), bool)
        for i in range(n):
            reduced = Image.fromarray(pages[i]).reduce(self.host_decimate)
            arr = np.asarray(reduced)
            dec[i] = arr[: self.decimated_shape[0], : self.decimated_shape[1]]
            if self.packed_binary:
                ink[i] = self._gather_ink_bits(binaries[i : i + 1])[0]
            else:
                # ink = 1 where the binarized image is dark (dataset.py:135-136)
                ink[i] = binaries[i][np.ix_(self.row_idx, self.col_idx)] < 128
        return self._put(dec), ink

    def _out_bufs(self, n: int, h: int, w: int):
        """Ring of trio buffers sized to the in-flight window (depth + the
        consumer's held batch + one being finished): a yielded batch stays
        valid until that many further batches finish.  run() grows the
        ring before a deeper run."""
        if not self.reuse_output_buffers:
            return None
        shape = (n, h, w, 3)
        size = self._ring_len
        if (
            self._trio_bufs is None
            or self._trio_bufs[0][0][0].shape != shape
            or len(self._trio_bufs[0]) < size
        ):
            ring = []
            for _ in range(size):
                color = np.empty(shape, np.uint8)
                ring.append((color, np.empty_like(color), np.empty_like(color)))
            self._trio_bufs = (ring, [0])
        ring, idx = self._trio_bufs
        trio = ring[idx[0] % len(ring)]
        idx[0] += 1
        return trio

    def _host_vote(self, pred: np.ndarray, ink: np.ndarray) -> np.ndarray:
        """Per-page cc-majority vote on the host (native C union-find; the
        reference's placement, postprocess.py:9-26) inside the overlapped
        finish stage."""
        from .. import native

        out = np.empty_like(pred)
        for i in range(pred.shape[0]):
            voted = native.cc_vote(ink[i], pred[i], self.n_classes)
            if voted is None:  # no native library: reference-shape fallback
                from ..data.dataset import SingleData
                from .postprocess import vote_connected_component_class

                voted = vote_connected_component_class(
                    pred[i].astype(np.int64),
                    SingleData(binary=ink[i].astype(np.uint8)),
                )
            out[i] = voted.astype(pred.dtype)
        return out

    def _finish(self, downloaded: np.ndarray, ink: np.ndarray):
        downloaded = downloaded[: ink.shape[0]]  # drop mesh-padding pages
        h, w = ink.shape[1:]
        if self.download == "packed":
            from .. import native
            from .output import finish_mask_trio, unpack_classes

            if self.yield_pred:
                # the label map must materialize on host anyway, so the
                # unpack + trio run through the python chain (the fused
                # native kernels never expose the classes)
                pred = unpack_classes(downloaded)[:, :h, :w]
                if self.cc_vote == "host":
                    pred = self._host_vote(pred, ink)
                trio = finish_mask_trio(
                    pred, ink, self.palette_np,
                    out=self._out_bufs(ink.shape[0], h, w))
                return (pred,) + trio
            if self.cc_vote == "host":
                # one native call for the whole vote finish (unpack + per-
                # component majority vote + trio, GIL-free) — the Python
                # chain below remains as the no-toolchain fallback and the
                # equality oracle (test_device_vote.py).  ONE ring slot
                # serves both paths (a second _out_bufs call would advance
                # the ring twice — see the no-vote branch below).
                out = self._out_bufs(ink.shape[0], h, w)
                fused = native.vote_finish_packed(
                    downloaded, ink.astype(np.uint8), self.palette_np,
                    self.n_classes, out=out,
                )
                if fused is not None:
                    return fused
                pred = unpack_classes(downloaded)[:, :h, :w]
                return finish_mask_trio(
                    self._host_vote(pred, ink), ink, self.palette_np, out=out
                )
            # ONE ring slot per batch: the same out buffers serve the
            # packed kernel and, when it is absent (stale .so / no
            # toolchain), the unpack fallback — a second _out_bufs call
            # here would advance the ring twice and halve the window a
            # yielded trio stays valid for
            out = self._out_bufs(ink.shape[0], h, w)
            fused = native.finish_masks_packed(downloaded, ink, self.palette_np, out=out)
            if fused is not None:
                return fused
            return finish_mask_trio(unpack_classes(downloaded), ink, self.palette_np, out=out)
        if self.download == "pred":
            pred = downloaded[:, :h, :w]
            if self.cc_vote == "host":
                pred = self._host_vote(pred, ink)
            trio = self._finish_pred(pred, ink)
            return ((pred,) + trio) if self.yield_pred else trio
        color = downloaded[:, :h, :w]
        not_ink3 = (~ink[..., None]).astype(np.uint8)
        ink3 = ink[..., None].astype(np.uint8)
        overlay = color * not_ink3  # color where background (output.py:46-49)
        inverted = color * ink3  # color where ink (output.py:50-51)
        return color, overlay, inverted

    def _finish_pred(self, pred: np.ndarray, ink: np.ndarray):
        """color/overlay/inverted from a (padded) uint8 class map."""
        from .output import finish_mask_trio

        h, w = ink.shape[1:]
        return finish_mask_trio(
            pred, ink, self.palette_np, out=self._out_bufs(ink.shape[0], h, w)
        )

    def _pack_ink(self, ink: np.ndarray) -> np.ndarray:
        """1-bit pack the ink mask at the padded device shape."""
        pad_h, pad_w = self.fused.padded_shape
        m, h, w = ink.shape
        padded = np.zeros((m, pad_h, pad_w), bool)
        padded[:, :h, :w] = ink
        return np.packbits(padded, axis=-1)

    def _download_finish(self, color_dev, ink: np.ndarray):
        """Blocking device->host download + host mask reconstruction; runs
        on the downloader thread so link time overlaps dispatch and prep."""
        return self._finish(np.asarray(color_dev), ink)

    # -------------------------------------------------------------- pipeline
    # ------------------------------------------------------- staged one-batch
    # run() pipelines a whole corpus internally; a serving engine instead
    # pipelines ACROSS requests — its collector thread preps batch k+1
    # while its device thread executes batch k.  These two methods expose
    # run()'s stages for that caller-owned overlap (server.py).
    def prep_batch(self, pages: np.ndarray, binaries: np.ndarray):
        """Stage 1, host+upload: decimate + device_put + ink gather for
        one batch.  Returns an opaque prepared unit for execute_batch.
        Safe to call from a different thread than execute_batch unless
        cc_vote='pallas' (tunneled-download corruption — run() serializes
        that case; tools/repro_pallas_download.py)."""
        vote = self.cc_vote in ("xla", "pallas")
        dec_dev, ink = self._prep(pages, binaries)
        ink_dev = self._put(self._pack_ink(ink)) if vote else None
        return dec_dev, ink, ink_dev

    def prep_pages(self, pages, binaries, n_pad: int):
        """prep_batch for a LIST of per-request full-res pages.

        Stacking n full-resolution pages into a fresh (n_pad, H, W) array
        first costs ~550 MB of allocate+copy traffic per 16-page A4 batch
        (the serve collector's measured wall); decimating/gathering each
        page individually writes only the small decimated/ink outputs.
        Pad slots keep zero pixels and no ink — exactly what a stacked
        white-binary pad page produces."""
        from .. import native

        vote = self.cc_vote in ("xla", "pallas")
        dec = np.zeros((n_pad,) + self.decimated_shape, np.uint8)
        oh, ow = len(self.row_idx), len(self.col_idx)
        ink = np.zeros((n_pad, oh, ow), bool)
        for i, (page, binary) in enumerate(zip(pages, binaries)):
            d = native.decimate_u8(page[None], self.host_decimate)
            if d is not None:
                dec[i] = d[0, : self.decimated_shape[0],
                           : self.decimated_shape[1]]
            else:  # no native lib: PIL box reduce (prep parity)
                from PIL import Image

                arr = np.asarray(Image.fromarray(page).reduce(self.host_decimate))
                dec[i] = arr[: self.decimated_shape[0], : self.decimated_shape[1]]
            if self.packed_binary:
                ink[i] = self._gather_ink_bits(binary[None])[0]
            else:
                got = native.gather_ink(binary[None], self.row_idx, self.col_idx)
                if got is not None:
                    ink[i] = got[0].astype(bool)
                else:
                    ink[i] = binary[np.ix_(self.row_idx, self.col_idx)] < 128
        ink_dev = self._put(self._pack_ink(ink)) if vote else None
        return self._put(dec), ink, ink_dev

    def execute_batch(self, prepared):
        """Stage 2, device+finish: dispatch the fused program, download,
        host vote/trio.  Returns what one run() iteration would yield."""
        dec_dev, ink, ink_dev = prepared
        if self._calibrate_fn is not None and "amax" not in self.variables:
            amax = jax.device_get(
                self._calibrate_fn(self.variables["params"], dec_dev)
            )
            self.variables = dict(self.variables, amax=amax)
        if ink_dev is not None:
            color_dev = self.fused(
                self.variables, dec_dev, self.palette_dev, ink_dev
            )
        else:
            color_dev = self.fused(self.variables, dec_dev, self.palette_dev)
        return self._finish(np.asarray(color_dev), ink)

    def run(self, pages: np.ndarray, binaries: np.ndarray, batch_size: int = 16,
            depth: int = 2):
        """Yield (color, overlay, inverted) batches, in order.

        Full 3-stage overlap: a prefetch thread preps+uploads batch i+1, the
        caller thread dispatches batch i, and a downloader thread drains
        batch i-1 (forced download + host trio).  ``depth`` bounds the
        in-flight device batches awaiting download (2 absorbs the tunneled
        link's phase swings without stacking host memory)."""
        # with reused trio buffers the ring must cover depth in-flight
        # finishes + the consumer's held batch + the one being written
        self._ring_len = max(4, max(depth, 1) + 2)
        n = pages.shape[0]
        starts = list(range(0, n, batch_size))

        if not starts:
            return

        vote = self.cc_vote if self.cc_vote in ("xla", "pallas") else False

        def prep(start):
            stop = min(start + batch_size, n)
            dec_dev, ink = self._prep(pages[start:stop], binaries[start:stop])
            ink_dev = self._put(self._pack_ink(ink)) if vote else None
            return dec_dev, ink, ink_dev

        first_prep = None
        if self._calibrate_fn is not None and "amax" not in self.variables:
            # one float forward over the first batch records per-conv
            # activation ranges; the int8 program uses them from then on.
            # The prepped batch is kept — re-prepping it would repeat the
            # dominant host cost (decimate + upload) for nothing
            first_prep = prep(starts[0])
            amax = jax.device_get(
                self._calibrate_fn(self.variables["params"], first_prep[0])
            )
            self.variables = dict(self.variables, amax=amax)

        if vote == "pallas":
            # fully sequential: the tunneled runtime corrupts (empties) the
            # download of a Pallas-bearing program when any other device
            # interaction — a concurrent device_put from the prefetch
            # thread, or the next dispatch — overlaps it
            # (tools/repro_pallas_download.py; the "xla" vote below keeps
            # the overlap because its program carries no Pallas call)
            for index, start in enumerate(starts):
                dec_dev, ink, ink_dev = (
                    first_prep if index == 0 and first_prep else prep(start)
                )
                color_dev = self.fused(
                    self.variables, dec_dev, self.palette_dev, ink_dev
                )
                yield self._finish(np.asarray(color_dev), ink)
            return

        from collections import deque

        with ThreadPoolExecutor(max_workers=2) as pool, \
                ThreadPoolExecutor(max_workers=1) as downloader:
            next_prep = (
                pool.submit(lambda: first_prep) if first_prep
                else pool.submit(prep, starts[0])
            )
            pending = deque()  # ordered futures of (color, overlay, inverted)
            for index, start in enumerate(starts):
                dec_dev, ink, ink_dev = next_prep.result()
                if index + 1 < len(starts):
                    next_prep = pool.submit(prep, starts[index + 1])
                if vote:
                    color_dev = self.fused(
                        self.variables, dec_dev, self.palette_dev, ink_dev
                    )
                else:
                    color_dev = self.fused(self.variables, dec_dev, self.palette_dev)
                pending.append(
                    downloader.submit(self._download_finish, color_dev, ink)
                )
                while len(pending) > max(depth, 1):
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
