"""Architecture and optimizer registries.

Capability parity with reference architecture.py: the ``Architecture`` enum
(14 variants, :5-19), name->constructor (:24-43), name->(preprocess fn,
needs-RGB) (:45-64), ``default_preprocess`` x/255 (:67-68), and the
``Optimizers`` enum (:71-90) — mapped onto optax instead of tf.keras.

Pretrained-encoder families (ResNet50 / MobileNetV2 / EfficientNet B0-B7)
are re-implemented in flax; ImageNet initialization is optional (this
environment has no model-zoo egress) and can be supplied from a local
weights file.
"""
from __future__ import annotations

import enum
from typing import Callable, Tuple

import numpy as np


def default_preprocess(x):
    """Grayscale normalization (reference architecture.py:67-68)."""
    return x / 255.0


def _imagenet_caffe_preprocess(x):
    """Keras 'caffe' mode: RGB->BGR, subtract ImageNet means (ResNet50)."""
    x = np.asarray(x, dtype=np.float32)[..., ::-1]
    return x - np.array([103.939, 116.779, 123.68], dtype=np.float32)


def _imagenet_tf_preprocess(x):
    """Keras 'tf' mode: scale to [-1, 1] (MobileNetV2)."""
    return np.asarray(x, dtype=np.float32) / 127.5 - 1.0


def _imagenet_torch_preprocess(x):
    """Keras 'torch' mode: [0,1] then ImageNet mean/std (EfficientNet)."""
    x = np.asarray(x, dtype=np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], dtype=np.float32)
    std = np.array([0.229, 0.224, 0.225], dtype=np.float32)
    return (x - mean) / std


class Architecture(enum.Enum):
    FCN_SKIP = "fcn_skip"
    FCN = "fcn"
    RES_NET = "image_res_net"
    RES_UNET = "res_unet"
    MOBILE_NET = "mobile_net"
    UNET = "unet"
    EFFNETB0 = "effb0"
    EFFNETB1 = "effb1"
    EFFNETB2 = "effb2"
    EFFNETB3 = "effb3"
    EFFNETB4 = "effb4"
    EFFNETB5 = "effb5"
    EFFNETB6 = "effb6"
    EFFNETB7 = "effb7"

    def model(self, n_classes: int, dtype=None):
        """Construct the flax module for this architecture."""
        import jax.numpy as jnp

        dtype = dtype or jnp.float32
        if self in (
            Architecture.EFFNETB0,
            Architecture.EFFNETB1,
            Architecture.EFFNETB2,
            Architecture.EFFNETB3,
            Architecture.EFFNETB4,
            Architecture.EFFNETB5,
            Architecture.EFFNETB6,
            Architecture.EFFNETB7,
        ):
            from .efficientnet import EffNetSeg

            return EffNetSeg(n_classes=n_classes, variant=self.value, dtype=dtype)
        if self is Architecture.FCN_SKIP:
            from .fcn import FCNSkip

            return FCNSkip(n_classes=n_classes, dtype=dtype)
        if self is Architecture.FCN:
            from .fcn import FCN

            return FCN(n_classes=n_classes, dtype=dtype)
        if self is Architecture.UNET:
            from .unet import UNet

            return UNet(n_classes=n_classes, dtype=dtype)
        if self is Architecture.RES_UNET:
            from .res_unet import ResUNet

            return ResUNet(n_classes=n_classes, dtype=dtype)
        if self is Architecture.RES_NET:
            from .resnet import ResNet50Seg

            return ResNet50Seg(n_classes=n_classes, dtype=dtype)
        if self is Architecture.MOBILE_NET:
            from .mobilenet import MobileNetSeg

            return MobileNetSeg(n_classes=n_classes, dtype=dtype)
        raise KeyError(self)

    def preprocess(self) -> Tuple[Callable, bool]:
        """(preprocess fn, needs-RGB) — reference architecture.py:45-64."""
        table = {
            Architecture.FCN_SKIP: (default_preprocess, False),
            Architecture.FCN: (default_preprocess, False),
            Architecture.RES_NET: (_imagenet_caffe_preprocess, True),
            Architecture.RES_UNET: (default_preprocess, False),
            Architecture.MOBILE_NET: (_imagenet_tf_preprocess, True),
            Architecture.UNET: (default_preprocess, False),
        }
        if self in table:
            return table[self]
        return (_imagenet_torch_preprocess, True)  # EfficientNet family

    def device_preprocess(self) -> Callable:
        """jnp-traceable twin of :meth:`preprocess`'s function, for fusing
        the normalization into the jitted step (compact uint8 transfers
        ship raw pixels and normalize on device)."""
        import jax.numpy as jnp

        def caffe(x):
            return x[..., ::-1] - jnp.array([103.939, 116.779, 123.68], jnp.float32)

        def tf_mode(x):
            return x / 127.5 - 1.0

        def torch_mode(x):
            mean = jnp.array([0.485, 0.456, 0.406], jnp.float32)
            std = jnp.array([0.229, 0.224, 0.225], jnp.float32)
            return (x / 255.0 - mean) / std

        table = {
            Architecture.RES_NET: caffe,
            Architecture.MOBILE_NET: tf_mode,
        }
        if self in table:
            return table[self]
        if self.preprocess()[0] is default_preprocess or self in (
            Architecture.FCN_SKIP, Architecture.FCN, Architecture.RES_UNET, Architecture.UNET,
        ):
            return lambda x: x / 255.0
        return torch_mode  # EfficientNet family

    @property
    def stride_factor(self) -> int:
        """Total downsampling factor: input H/W must be a multiple of this."""
        return {
            Architecture.FCN_SKIP: 8,
            Architecture.FCN: 8,
            Architecture.UNET: 16,
            Architecture.RES_UNET: 16,
            Architecture.RES_NET: 32,
            Architecture.MOBILE_NET: 32,
        }.get(self, 32)


class Optimizers(enum.Enum):
    ADAM = "adam"
    ADAMAX = "adamax"
    ADADELTA = "adadelta"
    ADAGRAD = "adagrad"
    RMSPROP = "rmsprop"
    SGD = "sgd"
    NADAM = "nadam"

    def make(
        self,
        l_rate: float,
        norm_clipping: bool = True,
        norm_clip_value: float = 1.0,
        value_clipping: bool = False,
        clip_value: float = 1.0,
    ):
        """Build an optax optimizer with the reference's clipping defaults
        (reference network.py:90-102: Adam + clipnorm=1.0)."""
        import optax

        base = {
            Optimizers.ADAM: lambda lr: optax.adam(lr),
            Optimizers.ADAMAX: lambda lr: optax.adamax(lr),
            Optimizers.ADADELTA: lambda lr: optax.adadelta(lr),
            Optimizers.ADAGRAD: lambda lr: optax.adagrad(lr),
            Optimizers.RMSPROP: lambda lr: optax.rmsprop(lr),
            Optimizers.SGD: lambda lr: optax.sgd(lr),
            Optimizers.NADAM: lambda lr: optax.nadam(lr),
        }[self](l_rate)

        chain = []
        if norm_clipping:
            chain.append(per_leaf_norm_clip(norm_clip_value))
        if value_clipping:
            chain.append(optax.clip(clip_value))
        chain.append(base)
        return optax.chain(*chain)


def per_leaf_norm_clip(max_norm: float):
    """Keras ``clipnorm`` semantics: clip each gradient tensor by its own
    L2 norm (unlike optax.clip_by_global_norm, which clips the whole tree)."""
    import jax
    import jax.numpy as jnp
    import optax

    def clip_leaf(g):
        norm = jnp.sqrt(jnp.sum(jnp.square(g)))
        scale = jnp.where(norm > max_norm, max_norm / (norm + 1e-12), 1.0)
        return g * scale.astype(g.dtype)

    def update_fn(updates, state, params=None):
        return jax.tree_util.tree_map(clip_leaf, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)
