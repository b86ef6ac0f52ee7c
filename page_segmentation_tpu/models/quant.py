"""Post-training int8 quantization of the grayscale FCN families.

A deployment fast path with no reference counterpart (the reference
serves float TF models only): per-tensor symmetric activation
quantization + per-output-channel symmetric weight quantization, with
int8 x int8 -> int32 convolutions on the MXU (TPU v5e runs int8 matmul
at 2x the bf16 peak).  Checkpoints are untouched — the int8 program is a
pure function of the float params plus a calibration pass, so quantized
serving needs no separate artifact:

    cal, q = QuantFCNSkip.pair(n_classes=3)          # calibrate/int8 twins
    amax = calibrate(cal, params, [batch])           # one pass, any data
    logits = q.apply({"params": params, "amax": amax}, images)

The twins mirror models/fcn.py's graphs (reference model.py:45-92 and
:206-234 channel plans) with identical module/param names, so float
checkpoints and ``.h5`` imports load directly.  ``mode='float'`` runs
the twin graph in plain float — bitwise-equal to models/fcn.py by
construction, gated in tests/test_quant.py — which pins the mirrored
topology to the source of truth.

Quantization scheme (per conv):
  * input:   s_in = amax/127 (amax recorded over calibration batches);
             q_x = round(clip(x/s_in)) in [-127, 127], int8
  * weights: s_w[o] = amax over (kh, kw, c_in) of |K|/127, int8
  * compute: lax conv with ``preferred_element_type=int32``
  * output:  y = acc * (s_in * s_w) + bias  (float32), then activation

Symmetric scales keep the zero point at 0 so the bucket padding
(ops/pad.py zeros) stays exact through quantization.

Measured (tools/ab_int8.py, tunneled TPU v5e, 2026-08-17, paired
alternating dispatches with novel content): at the production working
size (~438x310 after decimate-8 + normalize) int8 is 1.09-1.20x SLOWER
than bf16 (medians over two sessions; per-dispatch floors 137 vs
165 ms).  Same structural reason the s2d stem loses there
(models/s2d.py): at 1-80 channels the convs are nowhere near
MXU-bound, so the per-conv quantize/round/clip/dequantize elementwise
traffic on the VPU exceeds the MXU-side win, and int8's (32, 128)
min tile is harsher than bf16's (16, 128) for small channel counts.
int8 therefore stays OPT-IN; its regime is wide-channel models and
HBM-bandwidth-constrained serving, not this channel plan.  Re-evaluate
on a direct-attached chip with a real profiler.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from .layers import max_pool_same, relu


def _quantize_symmetric(x, scale):
    """round-to-nearest int8 with symmetric clipping; scale may be 0-d or
    per-channel broadcastable."""
    q = jnp.round(x / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


class QConv(nn.Module):
    """TFConv / TFConvTranspose twin with an int8 inference mode.

    Parameter names, shapes, and initializers match models/layers.py
    exactly (kernel (kh, kw, in, out) for conv; (kh, kw, out, in) for
    transpose — the Keras layouts), so a float checkpoint binds to the
    quantized graph unchanged.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    transpose: bool = False
    activation: Optional[Callable] = None
    mode: str = "int8"  # 'int8' | 'calibrate' | 'float'
    dtype: Any = jnp.float32  # float/calibrate compute dtype

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_features = x.shape[-1]
        if self.transpose:
            kernel = self.param(
                "kernel",
                nn.initializers.glorot_uniform(in_axis=3, out_axis=2),
                (kh, kw, self.features, in_features),
                jnp.float32,
            )
        else:
            kernel = self.param(
                "kernel",
                nn.initializers.glorot_uniform(),
                (kh, kw, in_features, self.features),
                jnp.float32,
            )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        if self.mode == "int8":
            amax = self.variable(
                "amax", "in", lambda: jnp.zeros((), jnp.float32)
            ).value
            s_in = jnp.maximum(amax, 1e-12) / 127.0
            q_x = _quantize_symmetric(x.astype(jnp.float32), s_in)
            # per-output-channel weight scale; output axis differs by layout
            w_axes = (0, 1, 3) if self.transpose else (0, 1, 2)
            w_amax = jnp.max(jnp.abs(kernel), axis=w_axes, keepdims=True)
            s_w = jnp.maximum(w_amax, 1e-12) / 127.0
            q_k = _quantize_symmetric(kernel, s_w)
            if self.transpose:
                acc = lax.conv_transpose(
                    q_x, q_k, strides=self.strides, padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    transpose_kernel=True,
                    preferred_element_type=jnp.int32,
                )
                s_w_out = s_w.reshape(1, 1, 1, self.features)  # from (1,1,F,1)
            else:
                acc = lax.conv_general_dilated(
                    q_x, q_k, window_strides=self.strides, padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                s_w_out = s_w  # keepdims over (0,1,2) -> (1,1,1,F)
            y = acc.astype(jnp.float32) * (s_in * s_w_out) + bias
        else:
            if self.mode == "calibrate":
                amax = self.variable(
                    "amax", "in", lambda: jnp.zeros((), jnp.float32)
                )
                if not self.is_initializing():
                    amax.value = jnp.maximum(
                        amax.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
                    )
            dt = self.dtype
            if self.transpose:
                y = lax.conv_transpose(
                    x.astype(dt), kernel.astype(dt), strides=self.strides,
                    padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    transpose_kernel=True,
                )
            else:
                y = lax.conv_general_dilated(
                    x.astype(dt), kernel.astype(dt), window_strides=self.strides,
                    padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            y = y + bias.astype(y.dtype)
        if self.activation is not None:
            y = self.activation(y)
        return y


class _QuantFCNBase(nn.Module):
    """Shared encoder/decoder wiring for the quantized twins."""

    n_classes: int
    mode: str = "int8"
    dtype: Any = jnp.float32
    skip: bool = True

    @classmethod
    def pair(cls, n_classes: int, dtype=jnp.float32):
        """(calibrate_twin, int8_twin) sharing one param structure."""
        return (
            cls(n_classes=n_classes, mode="calibrate", dtype=dtype),
            cls(n_classes=n_classes, mode="int8", dtype=dtype),
        )

    def _conv(self, features, kernel_size, name, act=None, transpose=False,
              strides=(1, 1)):
        return QConv(
            features, kernel_size, strides=strides, transpose=transpose,
            activation=act, mode=self.mode, dtype=self.dtype, name=name,
        )

    @nn.compact
    def __call__(self, image, binary=None, train: bool = False):
        x = image
        conv1 = self._conv(20, (5, 5), "conv1", relu)(x)
        conv2 = self._conv(30, (5, 5), "conv2")(conv1)
        pool2 = max_pool_same(conv2)
        conv3 = self._conv(40, (5, 5), "conv3", relu)(pool2)
        conv4 = self._conv(40, (5, 5), "conv4")(conv3)
        pool4 = max_pool_same(conv4)
        conv5 = self._conv(60, (5, 5), "conv5", relu)(pool4)
        conv6 = self._conv(60, (5, 5), "conv6")(conv5)
        pool6 = max_pool_same(conv6)
        conv7 = self._conv(80, (5, 5), "conv7", relu)(pool6)

        deconv1 = self._conv(80, (5, 5), "deconv1", relu, transpose=True)(conv7)
        deconv2 = self._conv(60, (2, 2), "deconv2", relu, transpose=True,
                             strides=(2, 2))(deconv1)
        if self.skip:
            deconv2 = jnp.concatenate([deconv2, conv6], axis=-1)
        deconv3 = self._conv(40, (5, 5), "deconv3", relu, transpose=True)(deconv2)
        if self.skip:
            deconv3 = jnp.concatenate([deconv3, conv5], axis=-1)
        deconv4 = self._conv(30, (2, 2), "deconv4", relu, transpose=True,
                             strides=(2, 2))(deconv3)
        if self.skip:
            deconv4 = jnp.concatenate([deconv4, conv3], axis=-1)
        deconv5 = self._conv(20, (2, 2), "deconv5", None, transpose=True,
                             strides=(2, 2))(deconv4)
        if self.skip:
            deconv5 = jnp.concatenate([deconv5, conv2], axis=-1)

        logits = self._conv(self.n_classes, (1, 1), "logits")(deconv5)
        return logits.astype(jnp.float32)


class QuantFCNSkip(_QuantFCNBase):
    """Quantized twin of models/fcn.py FCNSkip (reference model.py:45-92)."""

    skip: bool = True


class QuantFCN(_QuantFCNBase):
    """Quantized twin of models/fcn.py FCN (reference model.py:206-234)."""

    skip: bool = False


def calibrate(calibrate_module, params, batches) -> dict:
    """One forward pass per batch in calibrate mode; returns the 'amax'
    collection (running max of |input| per conv) for the int8 twin.

    ``batches``: iterable of (N, H, W, C) float arrays preprocessed the
    same way inference inputs will be (inverted, /255-normalized,
    bucket-padded) — e.g. one representative page batch.
    """
    amax = {}
    for batch in batches:
        variables = {"params": params}
        if amax:
            variables["amax"] = amax
        _, mutated = calibrate_module.apply(
            variables, jnp.asarray(batch), mutable=["amax"]
        )
        amax = jax.device_get(mutated["amax"])
    if not amax:
        raise ValueError("calibrate() needs at least one batch")
    return amax


_QUANT_TWINS = {"fcn_skip": QuantFCNSkip, "fcn": QuantFCN}


def twin_classes_for(module):
    """(calibrate_twin, int8_twin) instances for a float fcn/fcn_skip
    module — param structure identical, so the float variables bind."""
    from .fcn import FCN, FCNSkip

    if isinstance(module, FCNSkip):
        cls = QuantFCNSkip
    elif isinstance(module, FCN):
        cls = QuantFCN
    else:
        raise ValueError(
            f"int8 quantization supports the grayscale FCN families "
            f"(fcn/fcn_skip); got {type(module).__name__}"
        )
    return cls.pair(n_classes=module.n_classes)


def quantize_for_inference(architecture: str, n_classes: int, params,
                           calib_batches):
    """(int8_module, variables) ready for the fused predict pipeline.

    ``architecture``: 'fcn_skip' or 'fcn' (the grayscale families; the
    BN fine-tune families stay bf16 — their BatchNorm folding is a
    different transform).  ``variables`` carries the float params plus
    the calibration stats; pass both straight to ThroughputPredictor /
    make_fused_predict in place of the float module + params.
    """
    if architecture not in _QUANT_TWINS:
        raise ValueError(
            f"int8 quantization supports {sorted(_QUANT_TWINS)}; "
            f"got {architecture!r}"
        )
    cls = _QUANT_TWINS[architecture]
    cal, q = cls.pair(n_classes=n_classes)
    amax = calibrate(cal, params, calib_batches)
    return q, {"params": params, "amax": amax}
