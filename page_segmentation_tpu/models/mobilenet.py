"""MobileNetV2-encoder U-Net (flax).

Capability parity with reference model.py:95-148
(``unet_with_mobile_net_encoder``): MobileNetV2 feature extractor with
skips at the block_{1,3,6,13}_expand_relu / block_16_project activations,
a 512/256/128/64 transpose-conv up-stack with concat skips, a final
60-filter transpose conv and 1x1 logits.

The encoder is re-implemented (no model-zoo egress in this environment);
ImageNet initialization can be loaded from a local Keras .h5 via
``load_pretrained_encoder`` when available — the reference's
``weights='imagenet'`` becomes an optional local file.
"""
from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import TFConv, TFConvTranspose, relu


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TFConv(self.features, self.kernel, strides=self.strides, use_bias=False,
                   name="conv", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.999, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return jnp.minimum(relu(x), 6.0) if self.act else x  # relu6


class _DepthwiseBN(nn.Module):
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), strides=self.strides, padding="SAME", feature_group_count=c,
                    use_bias=False, name="dwconv", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.999, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return jnp.minimum(relu(x), 6.0)


class _InvertedResidual(nn.Module):
    features: int
    strides: Tuple[int, int]
    expand: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        h = x
        expand_out = None
        if self.expand != 1:
            h = _ConvBN(in_c * self.expand, (1, 1), dtype=self.dtype, name="expand")(h, train)
            expand_out = h
        h = _DepthwiseBN(self.strides, dtype=self.dtype, name="depthwise")(h, train)
        h = _ConvBN(self.features, (1, 1), act=False, dtype=self.dtype, name="project")(h, train)
        if self.strides == (1, 1) and in_c == self.features:
            h = x + h
        return h, expand_out


# (expansion, features, repeats, first-stride) per MobileNetV2 stage
_STAGES = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]
# block indices whose *expand* activation feeds a skip (reference
# model.py:103-108: block_1, block_3, block_6, block_13 expand_relu +
# block_16_project)
_SKIP_EXPANDS = {1, 3, 6, 13}


class MobileNetV2Encoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List:
        skips = []
        h = _ConvBN(32, (3, 3), strides=(2, 2), dtype=self.dtype, name="stem")(x, train)
        block_index = 0
        for expansion, features, repeats, first_stride in _STAGES:
            for r in range(repeats):
                strides = (first_stride, first_stride) if r == 0 else (1, 1)
                h, expand_out = _InvertedResidual(
                    _make_divisible(features), strides, expansion, dtype=self.dtype,
                    name=f"block_{block_index}",
                )(h, train)
                if block_index in _SKIP_EXPANDS and expand_out is not None:
                    skips.append(expand_out)
                if block_index == 16:
                    skips.append(h)  # block_16_project
                block_index += 1
        return skips


class MobileNetSeg(nn.Module):
    """U-Net over the MobileNetV2 encoder (reference model.py:95-148)."""

    n_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, binary=None, train: bool = False):
        x = image.astype(self.dtype)
        skips = MobileNetV2Encoder(dtype=self.dtype, name="encoder")(x, train)
        h = skips[-1]
        up_features = [512, 256, 128, 64]
        for i, (features, skip) in enumerate(zip(up_features, reversed(skips[:-1]))):
            h = TFConvTranspose(features, (3, 3), strides=(2, 2), activation=relu,
                                name=f"up{i}", dtype=self.dtype)(h)
            h = jnp.concatenate([h, skip], axis=-1)
        h = TFConvTranspose(60, (3, 3), strides=(2, 2), activation=relu,
                            name="up_final", dtype=self.dtype)(h)
        logits = TFConv(self.n_classes, (1, 1), padding="VALID", name="logits", dtype=self.dtype)(h)
        return logits.astype(jnp.float32)
