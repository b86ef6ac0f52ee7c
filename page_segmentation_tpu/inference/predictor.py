"""Prediction orchestration.

Parity with reference predictor.py / predictor_data.py: ``PredictSettings``,
``Prediction``, ``Predictor`` with ``predict`` / ``predict_single`` /
``predict_masks`` and the color/overlay/inverted output-dir layout
(predictor.py:21-25).

Beyond parity, ``predict_dataset_fast`` batches same-bucket pages through
the fused device pipeline (forward + argmax + mask rendering on-TPU) with
double-buffered host transfers — the throughput path behind bench.py.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Generator, List, NamedTuple, Optional

import numpy as np

from ..core.colors import ColorMap
from ..data.dataset import Dataset, SingleData, entry_shape, materialize
from ..ops.pad import bucket_shape, pad_to
from .classifier import PixelClassifier
from .output import Masks, generate_output_masks, output_data, scale_to_original_shape


class Prediction(NamedTuple):
    labels: np.ndarray
    probabilities: np.ndarray
    data: SingleData


@dataclass
class PredictSettings:
    network: Optional[str] = None
    output: Optional[str] = None
    high_res_output: bool = False
    color_map: Optional[ColorMap] = None
    n_classes: int = -1
    post_process: Optional[List[Callable[[np.ndarray, SingleData], np.ndarray]]] = None
    gpu_allow_growth: bool = False  # accepted for parity; meaningless on TPU
    compute_dtype: str = "float32"
    bucket_granularity: int = 1
    # fast path: fuse a lone cc-majority post-processor into the device
    # dispatch (batched device CC + histogram vote).  None = auto (on when
    # the backend is a real TPU).
    device_post_process: Optional[bool] = None
    # exact space-to-depth stem rewrite for fcn/fcn_skip (models/s2d.py);
    # TPU fast path, parameters identical either way
    s2d_stem: bool = False
    # int8 post-training quantization for the batched fast path
    # (models/quant.py; fcn/fcn_skip only): activation ranges calibrate on
    # the first batch, convs run int8 x int8 -> int32 on the MXU.  The
    # per-page parity path stays float.
    int8: bool = False
    # spatial partitioning: with n_devices > 1, pages whose prepared image
    # exceeds spatial_threshold pixels forward as row bands across a device
    # mesh with receptive-field halos (parallel/spatial.py) — exact, and
    # the answer to pages too large for one chip's HBM (the reference's
    # only recourse is host downscaling, dataset.py:139-143)
    n_devices: Optional[int] = None
    spatial_threshold: int = 16_000_000
    # single-chip banding: pages taller than (band_rows + 2*margin) forward
    # in sequential row bands with receptive-field halos
    # (parallel/spatial.banded_forward) — exact, and peak HBM is bounded by
    # one window's activations instead of the whole page's.  The
    # out-of-mesh complement of n_devices spatial partitioning
    band_rows: Optional[int] = None


class Predictor:
    def __init__(self, settings: PredictSettings, network: Optional[PixelClassifier] = None):
        import jax.numpy as jnp

        self.settings = settings
        self.network = network
        if not network:
            dtype = jnp.bfloat16 if settings.compute_dtype == "bfloat16" else jnp.float32
            self.network = PixelClassifier(
                n_classes=settings.n_classes,
                model_path=os.path.abspath(settings.network),
                compute_dtype=dtype,
                bucket_granularity=settings.bucket_granularity,
                s2d_stem=settings.s2d_stem,
                int8=settings.int8,
            )
        if settings.output:
            for category in ("overlay", "color", "inverted"):
                os.makedirs(os.path.join(settings.output, category), exist_ok=True)
        self._spatial_mesh = None
        if settings.n_devices and settings.n_devices > 1:
            from ..parallel.mesh import make_mesh

            self._spatial_mesh = make_mesh(settings.n_devices)

    def predict(self, dataset: Dataset) -> Generator[Prediction, None, None]:
        for data in dataset.data:
            yield self.predict_single(data)

    def _preprocessed_hwc(self, data: SingleData) -> np.ndarray:
        """The network's preprocessed (H, W, C) array for one page —
        shared by the banded and spatial forward paths."""
        net = self.network
        arr = np.asarray(net.preprocess(np.asarray(data.image, np.float32)))
        if arr.ndim == 2:
            arr = arr[..., None]
        elif arr.ndim == 3 and arr.shape[-1] == 1 and net.rgb:
            arr = np.repeat(arr, 3, axis=-1)
        return arr

    def _spatial_single_data(self, data: SingleData):
        """predict_single_data via row-band spatial partitioning
        (parallel/spatial.py): exact for the finite-RF conv families."""
        import scipy.special

        from ..parallel.spatial import DEFAULT_MARGINS, spatial_forward

        net = self.network
        arr = self._preprocessed_hwc(data)
        logit = spatial_forward(
            net.module,
            net.variables,
            arr,
            self._spatial_mesh,
            margin=DEFAULT_MARGINS.get(net.architecture.value, 192),
            stride_factor=net.architecture.stride_factor,
        )
        prob = scipy.special.softmax(logit, axis=-1)
        return logit, prob, logit.argmax(-1)

    def _use_spatial(self, data: SingleData) -> bool:
        if self._spatial_mesh is None:
            return False
        from ..parallel.spatial import DEFAULT_MARGINS

        if self.network.architecture.value not in DEFAULT_MARGINS:
            # effnet: squeeze-excitation global-pools over the page, so
            # band splitting is not exact (see parallel/spatial.py)
            return False
        h, w = data.image.shape[:2]
        return h * w > self.settings.spatial_threshold

    def _banded_single_data(self, data: SingleData):
        """predict_single_data in sequential single-chip row bands
        (parallel/spatial.banded_forward): exact, bounded peak HBM."""
        import scipy.special

        from ..parallel.spatial import DEFAULT_MARGINS, banded_forward

        net = self.network
        arr = self._preprocessed_hwc(data)
        logit = banded_forward(
            net.module,
            net.variables,
            arr,
            band_rows=self.settings.band_rows,
            margin=DEFAULT_MARGINS.get(net.architecture.value, 192),
            stride_factor=net.architecture.stride_factor,
        )
        prob = scipy.special.softmax(logit, axis=-1)
        return logit, prob, logit.argmax(-1)

    def _use_banded(self, data: SingleData) -> bool:
        if not self.settings.band_rows:
            return False
        from ..parallel.spatial import DEFAULT_MARGINS

        if self.network.architecture.value not in DEFAULT_MARGINS:
            return False  # effnet: SE global pooling, banding not exact
        margin = DEFAULT_MARGINS[self.network.architecture.value]
        return data.image.shape[0] > self.settings.band_rows + 2 * margin

    def predict_single(self, data: SingleData) -> Prediction:
        data = materialize([data])[0]  # streaming entry -> transient copy
        if self._use_spatial(data):
            logit, prob, pred = self._spatial_single_data(data)
        elif self._use_banded(data):
            logit, prob, pred = self._banded_single_data(data)
        else:
            logit, prob, pred = self.network.predict_single_data(data)
        if self.settings.high_res_output:
            data, pred = scale_to_original_shape(data, pred)
        if self.settings.post_process:
            for processor in self.settings.post_process:
                pred = processor(pred, data)
        return Prediction(pred, prob, data)

    def predict_masks(self, data: SingleData) -> Masks:
        prediction = self.predict_single(data)
        return generate_output_masks(prediction.data, prediction.labels, self.settings.color_map)

    def save_prediction(self, prediction: Prediction) -> None:
        output_data(self.settings.output, prediction.labels, prediction.data, self.settings.color_map)

    # ------------------------------------------------------------ fast path
    def predict_dataset_fast(
        self,
        dataset: Dataset,
        batch_size: int = 8,
        write_output: bool = False,
    ):
        """Batched fused prediction.

        Groups pages by bucket shape, pads to (batch, H, W), runs the fused
        on-device pipeline, crops back, and yields
        (data, pred, color, overlay, inverted) per page.
        """
        color_map = self.settings.color_map or (dataset.color_map if dataset else None)
        palette = color_map.palette if color_map else np.zeros((self.network.n_classes, 3), np.uint8)

        # a lone cc-majority post-processor fuses into the device dispatch
        # (one batched Pallas CC + vote instead of per-page host round-trips)
        from .postprocess import vote_connected_component_class

        post = self.settings.post_process or []
        device_vote = self.settings.device_post_process
        if device_vote is None:
            import jax

            device_vote = jax.default_backend() == "tpu"
        # high_res_output post-processes at the original scale (after the
        # upscale, reference predictor.py:35-41), so the normalized-scale
        # device vote would not be equivalent there
        device_vote = (
            bool(device_vote)
            and post == [vote_connected_component_class]
            and not self.settings.high_res_output
        )
        host_post = None if device_vote else (post or None)

        groups = {}
        for data in dataset.data:
            shape = bucket_shape(
                entry_shape(data),  # header-peeked for streaming entries
                self.network.architecture.stride_factor,
                self.network.bucket_granularity,
            )
            groups.setdefault(shape, []).append(data)

        for shape, members in groups.items():
            for start in range(0, len(members), batch_size):
                chunk = materialize(members[start : start + batch_size])
                n = len(chunk)
                # ragged tail chunks pad to the full batch size (zero
                # pages, results cropped per page below) so every chunk of
                # a bucket reuses one compiled program; sub-batch-size
                # groups pad the batch dim to a power of two — serving
                # feeds dynamic batch sizes through here, and an exact-n
                # trace per size is a recompile per size (measured as
                # multi-second p90 stalls on the batching service)
                n_padded = (
                    batch_size if len(members) > batch_size
                    else min(batch_size, 1 << max(0, n - 1).bit_length())
                )
                images = np.zeros((n_padded,) + shape, dtype=np.uint8)
                binaries = np.zeros((n_padded,) + shape, dtype=np.uint8)
                for i, d in enumerate(chunk):
                    images[i] = pad_to(d.image, shape)
                    binaries[i] = pad_to(d.binary, shape)
                pred_d, masks_d = self.network.predict_batch_masks(
                    images, binaries, palette, device_vote=device_vote
                )
                pred_h = np.asarray(pred_d)
                color_h, overlay_h, inverted_h = np.asarray(masks_d)
                for i, d in enumerate(chunk):
                    h, w = d.image.shape[:2]
                    pred_i = pred_h[i, :h, :w]
                    if self.settings.high_res_output:
                        # reference predictor.py:35-36: upscale the label
                        # map to the original page shape before post/output
                        d, pred_i = scale_to_original_shape(d, pred_i)
                    if host_post or self.settings.high_res_output:
                        # post-processors mutate the label map (and high-res
                        # rescales it), so the mask trio is rebuilt
                        # host-side from the final labels
                        for post_fn in host_post or []:
                            pred_i = post_fn(pred_i, d)
                        masks = generate_output_masks(d, pred_i, color_map)
                        result = (d, pred_i, masks.color, masks.overlay, masks.inverted_overlay)
                    else:
                        result = (
                            d,
                            pred_i,
                            color_h[i, :h, :w],
                            overlay_h[i, :h, :w],
                            inverted_h[i, :h, :w],
                        )
                    if write_output and self.settings.output:
                        from ..core.image_io import imsave, imsave_indexed

                        filename = d.output_path or os.path.basename(d.image_path or "page.png")
                        # the color product is the palette applied to the
                        # final labels — write it as an indexed PNG (same
                        # decoded RGB, ~3x faster/smaller flat-color encode)
                        imsave_indexed(
                            os.path.join(self.settings.output, "color", filename),
                            pred_i, palette,
                        )
                        imsave(os.path.join(self.settings.output, "overlay", filename), result[3])
                        imsave(os.path.join(self.settings.output, "inverted", filename), result[4])
                    yield result
