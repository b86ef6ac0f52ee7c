"""Network runtime: model build/load, jit cache, single & batched forward.

TPU-native counterpart of the reference ``Network`` class (network.py:18-260)
for the inference half: architecture selection + preprocessing
(network.py:45-57,252-255), checkpoint loading (network.py:76-107 — here
native msgpack checkpoints or imported Keras .h5), and
``predict_single_data`` returning (logit, prob, pred) (network.py:248-260).

Design difference from the reference: instead of dynamic shapes inside the
graph, images are padded host-side to bucketed static shapes (ops/pad.py)
and the jitted forward is cached per bucket; logits are cropped back
exactly.  A batched entry point amortizes dispatch for throughput.
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import SingleData
from ..models.registry import Architecture
from ..ops.pad import bucket_shape, crop_to, pad_to

logger = logging.getLogger(__name__)


class PixelClassifier:
    """Holds a flax model + variables and serves cached-jit forward passes.

    ``variables`` is the full flax collection dict — ``params`` plus
    ``batch_stats`` for the BN-bearing encoder families (mobilenet/resnet/
    efficientnet)."""

    def __init__(
        self,
        n_classes: int,
        architecture: Architecture = Architecture.FCN_SKIP,
        model_path: Optional[str] = None,
        compute_dtype=jnp.float32,
        bucket_granularity: int = 1,
        seed: int = 0,
        s2d_stem: bool = False,
        int8: bool = False,
    ):
        self.architecture = architecture
        self.n_classes = n_classes
        self.compute_dtype = compute_dtype
        self.bucket_granularity = bucket_granularity
        # exact space-to-depth stem rewrite (fcn/fcn_skip TPU fast path,
        # models/s2d.py); parameters are identical either way
        self.s2d_stem = s2d_stem
        # int8 post-training quantization (models/quant.py): the batched
        # fast path runs the quantized twin, calibrated on its first batch;
        # the per-page parity path (predict_single_data) stays float
        self.int8 = bool(int8)
        self._int8_state = None  # (int8_twin, amax) once calibrated
        self.module = architecture.model(n_classes, dtype=compute_dtype, s2d_stem=s2d_stem)
        self.preprocess, self.rgb = architecture.preprocess()
        self.variables = None
        if model_path:
            self.load(model_path)
        else:
            self.init_params(seed)
        self._forward_cache = {}
        self._masks_cache = {}

    # ----------------------------------------------------------- properties
    @property
    def params(self):
        return self.variables["params"]

    @params.setter
    def params(self, value):
        self.variables = {**(self.variables or {}), "params": value}

    @property
    def model_state(self):
        return {k: v for k, v in self.variables.items() if k != "params"}

    # ----------------------------------------------------------- params I/O
    def init_params(self, seed: int = 0) -> None:
        rng = jax.random.PRNGKey(seed)
        h = w = self.architecture.stride_factor * 2
        c = 3 if self.rgb else 1
        dummy = jnp.zeros((1, h, w, c), jnp.float32)
        self.variables = dict(self.module.init({"params": rng, "dropout": rng}, dummy))

    def _rebuild(self, architecture: Architecture) -> None:
        self.architecture = architecture
        self.module = architecture.model(
            self.n_classes, dtype=self.compute_dtype,
            s2d_stem=getattr(self, "s2d_stem", False),
        )
        self.preprocess, self.rgb = architecture.preprocess()

    def load(self, path: str) -> None:
        path = str(path)
        if path.endswith(".h5") and not os.path.exists(path):
            # legacy-model migration hook (reference network.py:60-68 shells
            # out to a TF1->TF2 migration script it does not ship when only
            # a .meta exists; here the migration is native —
            # models/tf1_import.py maps the checkpoint's creation-ordered
            # trainables by order, shape-validated)
            meta_path = path[:-3] + ".meta"
            if os.path.exists(meta_path):
                from ..models.tf1_import import load_tf1_checkpoint

                try:
                    params = load_tf1_checkpoint(meta_path, self.architecture, self.n_classes)
                except ImportError as exc:
                    # load_tf1_checkpoint imports TensorFlow lazily (only
                    # to read the checkpoint); without it, fail the way
                    # every other missing-model path does
                    raise FileNotFoundError(
                        f"{path} not found but legacy TF1 checkpoint {meta_path} "
                        f"exists; TF1 migration needs TensorFlow importable "
                        f"({exc})"
                    ) from exc
                self.variables = {"params": params}
                logger.info(f"Migrated legacy TF1 checkpoint {meta_path} "
                            f"({self.architecture.value}, by-order)")
                return
        if path.endswith(".h5"):
            from ..models.h5_import import load_keras_variables

            variables, detected = load_keras_variables(path, self.architecture, self.n_classes)
            if detected is not None:
                self._rebuild(detected)
            self.variables = variables
        else:
            from ..train.checkpoint import load_checkpoint

            variables, meta = load_checkpoint(path)
            arch = meta.get("architecture")
            if arch:
                self._rebuild(Architecture(arch))
            self.variables = variables

    # -------------------------------------------------------------- forward
    def _forward_fn(self, batch_shape: Tuple[int, ...]):
        if batch_shape not in self._forward_cache:

            @jax.jit
            def forward(variables, image):
                return self.module.apply(variables, image)

            self._forward_cache[batch_shape] = forward
        return self._forward_cache[batch_shape]

    def _prepare_input(self, image: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int]]:
        """Preprocess + pad one image to its bucket; returns HWC float32."""
        if self.rgb and (image.ndim == 2 or image.shape[-1] != 3):
            image = np.concatenate([image[..., None]] * 3, axis=-1)
        arr = np.asarray(self.preprocess(np.asarray(image, dtype=np.float32)), dtype=np.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        orig_hw = arr.shape[:2]
        target = bucket_shape(orig_hw, self.architecture.stride_factor, self.bucket_granularity)
        return pad_to(arr, target), orig_hw

    def predict_single_data(self, data: SingleData):
        """(logit, prob, pred) for one page (reference network.py:248-260)."""
        from scipy.special import softmax

        arr, orig_hw = self._prepare_input(data.image)
        forward = self._forward_fn((1,) + arr.shape)
        logits = forward(self.variables, arr[None])
        logit = crop_to(np.asarray(logits[0]), orig_hw)
        prob = softmax(logit, -1)
        pred = np.argmax(logit, -1)
        return logit, prob, pred

    def predict_batch_masks(
        self,
        images: np.ndarray,
        binaries: np.ndarray,
        palette: np.ndarray,
        device_vote: bool = False,
    ):
        """Fused batched forward + argmax with link-disciplined transfers.

        images: (N, H, W) uint8 prepared pages, all one bucket shape.
        binaries: (N, H, W) uint8 (1 = ink).
        Returns host arrays (pred (N, H, W) uint8, masks (3, N, H, W, 3)
        uint8 = [color, overlay, inverted]).  Upload is raw uint8 when
        normalization fuses on device; only the class map crosses back
        (2-bit packed when n_classes <= 4) and the mask trio is rebuilt
        host-side from the binary via the native finish kernel.

        ``device_vote=True`` fuses the cc-majority post-processor into the
        same dispatch: the ink mask is uploaded 1-bit packed and the Pallas
        CC labeler + segment-sum histogram vote the class map on device
        before download (exact counterpart of
        ``vote_connected_component_class`` — gated by
        tests/test_device_vote.py).
        """
        palette = np.ascontiguousarray(palette, np.uint8)
        pack = self.n_classes <= 4 and images.shape[2] % 4 == 0
        # bucketed widths are stride-factor (>= 8) multiples, so ink always
        # packs in practice; the raw-u8 branch is defensive only
        pack_ink = images.shape[2] % 8 == 0
        if self.int8 and self._int8_state is None:
            # first batch doubles as the calibration set: one float forward
            # of the calibrate twin records per-conv activation ranges
            from ..models.quant import twin_classes_for

            cal, q_module = twin_classes_for(self.module)
            if self.rgb:
                raise ValueError("int8 supports the grayscale FCN families only")

            @jax.jit
            def _calibrate(params, x):
                xf = x.astype(jnp.float32)[..., None] / 255.0
                _, mutated = cal.apply({"params": params}, xf, mutable=["amax"])
                return mutated["amax"]

            amax = jax.device_get(_calibrate(self.params, images))
            self._int8_state = (q_module, amax)
        key = ("masks", images.shape, pack, device_vote, self.int8)
        if key not in self._masks_cache:
            module = self._int8_state[0] if self.int8 else self.module
            preprocess_on_device = not self.rgb  # grayscale archs: x/255 fuses on device
            host_preprocess = self.preprocess
            rgb = self.rgb
            n_classes = self.n_classes
            from ..ops.pallas_cc import cc_vote_batch_xla
            from .output import pack_classes_device, unpack_bits_device

            @jax.jit
            def fused(variables, x, ink):
                # u8 pixels in when preprocessing fuses on device (1/4 the
                # upload bytes); only the class map comes back — packed to
                # 2 bits/pixel when the class count allows — and the mask
                # trio is rebuilt host-side from the host-resident binary
                if preprocess_on_device:
                    x = x.astype(jnp.float32)[..., None] / 255.0
                logits = module.apply(variables, x)
                pred = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
                if device_vote:
                    # the pure-XLA vote: identical semantics to the Pallas
                    # labeler, but the program stays Pallas-free so its
                    # download can overlap other device traffic (and CPU
                    # tests skip interpret mode)
                    ink_mask = unpack_bits_device(ink) if pack_ink else ink != 0
                    pred = cc_vote_batch_xla(
                        pred, ink_mask, n_classes=n_classes
                    ).astype(jnp.uint8)
                return pack_classes_device(pred) if pack else pred

            self._masks_cache[key] = (fused, preprocess_on_device, host_preprocess, rgb)
        fused, on_device, host_preprocess, rgb = self._masks_cache[key]
        if on_device:
            x = images  # uint8, normalized on device
        else:
            x = np.stack([images] * 3, axis=-1).astype(np.float32) if rgb else images[..., None]
            x = np.asarray(host_preprocess(x), np.float32)
        from .output import finish_mask_trio, pack_bits_host, unpack_classes

        ink = (binaries != 0).astype(np.uint8)  # 1 = ink in prepared binaries
        if device_vote:
            ink_up = pack_bits_host(ink) if pack_ink else ink
        else:  # placeholder: the jitted fn ignores it, but jit wants an arg
            ink_up = np.zeros((1,), np.uint8)
        variables = (
            {"params": self.params, "amax": self._int8_state[1]}
            if self.int8 else self.variables
        )
        downloaded = np.asarray(fused(variables, x, ink_up))
        pred = unpack_classes(downloaded) if pack else downloaded
        return pred, np.stack(finish_mask_trio(pred, ink, palette))


def network_for_model(model_path: str, n_classes: int, **kwargs) -> PixelClassifier:
    """Convenience constructor mirroring reference
    ``Network("Predict", n_classes, model=path)`` (predictor.py:19-20)."""
    return PixelClassifier(n_classes=n_classes, model_path=os.path.abspath(model_path), **kwargs)
