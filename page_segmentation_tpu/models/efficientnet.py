"""EfficientNet B0-B7 encoder U-Net (flax).

Capability parity with reference model.py:368-407 (``eff_net_fine_tuning``
parameterized over efn.EfficientNetB0..B7, architecture.py:35-42): MBConv
backbone with skips at the block{2,3,4,6}a expand activations, a
256/196/128/64 simple-conv decoder over nearest upsampling with concat
skips, final concat with the input and 1x1 logits.

Encoder re-implemented with the standard EfficientNet width/depth
multipliers; ImageNet weights optional-local (no egress), mirroring the
reference's ``weights='imagenet'``.
"""
from __future__ import annotations

import math
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import TFConv, relu, upsample2x

# (width_mult, depth_mult) per variant
_VARIANTS = {
    "effb0": (1.0, 1.0),
    "effb1": (1.0, 1.1),
    "effb2": (1.1, 1.2),
    "effb3": (1.2, 1.4),
    "effb4": (1.4, 1.8),
    "effb5": (1.6, 2.2),
    "effb6": (1.8, 2.6),
    "effb7": (2.0, 3.1),
}

# (expansion, features, repeats, stride, kernel) for the 7 EfficientNet stages
_STAGES = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


def _round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def _round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def swish(x):
    return x * jax.nn.sigmoid(x)


class _ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    act: bool = True
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides, padding="SAME",
                    feature_group_count=self.groups, use_bias=False, name="conv",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return swish(x) if self.act else x


class _SqueezeExcite(nn.Module):
    reduced: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = TFConv(self.reduced, (1, 1), name="reduce", dtype=self.dtype)(s)
        s = swish(s)
        s = TFConv(c, (1, 1), name="expand", dtype=self.dtype)(s)
        return x * jax.nn.sigmoid(s)


class _MBConv(nn.Module):
    features: int
    kernel: int
    strides: Tuple[int, int]
    expand: int
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        h = x
        expand_out = None
        if self.expand != 1:
            h = _ConvBN(in_c * self.expand, (1, 1), dtype=self.dtype, name="expand")(h, train)
            expand_out = h
        h = _ConvBN(h.shape[-1], (self.kernel, self.kernel), self.strides,
                    groups=h.shape[-1], dtype=self.dtype, name="depthwise")(h, train)
        h = _SqueezeExcite(max(1, int(in_c * self.se_ratio)), dtype=self.dtype, name="se")(h)
        h = _ConvBN(self.features, (1, 1), act=False, dtype=self.dtype, name="project")(h, train)
        if self.strides == (1, 1) and in_c == self.features:
            h = x + h
        return h, expand_out


class EffNetEncoder(nn.Module):
    variant: str = "effb0"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List:
        width, depth = _VARIANTS[self.variant]
        # the reference's skips: block{2,3,4,6}a expand activations — the
        # first block of stages 2, 3, 4 and 6 (1-indexed)
        skip_stages = {1, 2, 3, 5}  # 0-indexed
        skips = []
        h = _ConvBN(_round_filters(32, width), (3, 3), (2, 2), dtype=self.dtype, name="stem")(x, train)
        for stage_index, (expansion, features, repeats, stride, kernel) in enumerate(_STAGES):
            features = _round_filters(features, width)
            repeats = _round_repeats(repeats, depth)
            for r in range(repeats):
                strides = (stride, stride) if r == 0 else (1, 1)
                h, expand_out = _MBConv(features, kernel, strides, expansion,
                                        dtype=self.dtype,
                                        name=f"s{stage_index}_b{r}")(h, train)
                if r == 0 and stage_index in skip_stages and expand_out is not None:
                    skips.append(expand_out)
        skips.append(h)
        return skips


class EffNetSeg(nn.Module):
    """U-Net over an EfficientNet encoder (reference model.py:368-407)."""

    n_classes: int
    variant: str = "effb0"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, binary=None, train: bool = False):
        x = image.astype(self.dtype)

        def conv_block_simple(h, features, name):
            return relu(TFConv(features, (3, 3), name=name, dtype=self.dtype)(h))

        skips = EffNetEncoder(variant=self.variant, dtype=self.dtype, name="encoder")(x, train)
        conv1, conv2, conv3, conv4 = skips[0], skips[1], skips[2], skips[3]

        h = conv_block_simple(conv4, 256, "b_1")
        h = jnp.concatenate([upsample2x(h), conv3], axis=-1)
        h = conv_block_simple(h, 256, "conv6_1")
        h = conv_block_simple(h, 256, "conv6_2")
        h = jnp.concatenate([upsample2x(h), conv2], axis=-1)
        h = conv_block_simple(h, 196, "conv7_1")
        h = conv_block_simple(h, 196, "conv7_2")
        h = jnp.concatenate([upsample2x(h), conv1], axis=-1)
        h = conv_block_simple(h, 128, "conv8_1")
        h = conv_block_simple(h, 128, "conv8_2")
        h = jnp.concatenate([upsample2x(h), x], axis=-1)
        h = conv_block_simple(h, 64, "conv9_1")
        h = conv_block_simple(h, 64, "conv9_2")
        logits = TFConv(self.n_classes, (1, 1), padding="VALID", name="logits", dtype=self.dtype)(h)
        return logits.astype(jnp.float32)
