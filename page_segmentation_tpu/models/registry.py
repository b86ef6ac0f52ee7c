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


# normalization-mode constants shared by the host (numpy) and device (jnp)
# implementations — one source of truth so compact uint8 transfers (device
# normalization) stay bit-identical to the host path
_CAFFE_MEAN = (103.939, 116.779, 123.68)  # BGR order after the flip
_TORCH_MEAN = (0.485, 0.456, 0.406)
_TORCH_STD = (0.229, 0.224, 0.225)


def _make_preprocess(mode: str, xp):
    """The normalization function for a mode in either array namespace.

    Modes follow Keras preprocess_input conventions (reference
    architecture.py:45-68): 'gray' /255, 'caffe' BGR minus ImageNet means
    (ResNet50), 'tf' [-1, 1] (MobileNetV2), 'torch' [0,1] then ImageNet
    mean/std (EfficientNet).
    """
    if mode == "gray":
        return lambda x: x / 255.0
    if mode == "caffe":
        mean = xp.asarray(_CAFFE_MEAN, dtype=xp.float32)
        return lambda x: x[..., ::-1] - mean
    if mode == "tf":
        return lambda x: x / 127.5 - 1.0
    mean = xp.asarray(_TORCH_MEAN, dtype=xp.float32)
    std = xp.asarray(_TORCH_STD, dtype=xp.float32)
    return lambda x: (x / 255.0 - mean) / std


def default_preprocess(x):
    """Grayscale normalization (reference architecture.py:67-68)."""
    return x / 255.0


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

    def model(self, n_classes: int, dtype=None, s2d_stem: bool = False):
        """Construct the flax module for this architecture.

        ``s2d_stem`` (fcn/fcn_skip only) enables the exact
        space-to-depth rewrite of the full-resolution stem convs
        (models/s2d.py) — a TPU fast path; ignored elsewhere."""
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

            return FCNSkip(n_classes=n_classes, dtype=dtype, s2d_stem=s2d_stem)
        if self is Architecture.FCN:
            from .fcn import FCN

            return FCN(n_classes=n_classes, dtype=dtype, s2d_stem=s2d_stem)
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

    @property
    def preprocess_mode(self) -> str:
        """Keras normalization mode (reference architecture.py:45-64);
        the single source of truth for host AND device normalization."""
        return {
            Architecture.FCN_SKIP: "gray",
            Architecture.FCN: "gray",
            Architecture.UNET: "gray",
            Architecture.RES_UNET: "gray",
            Architecture.RES_NET: "caffe",
            Architecture.MOBILE_NET: "tf",
        }.get(self, "torch")  # EfficientNet family

    def preprocess(self) -> Tuple[Callable, bool]:
        """(host preprocess fn, needs-RGB)."""
        mode = self.preprocess_mode
        host = _make_preprocess(mode, np)
        if mode == "gray":
            return host, False

        def as_float(x, _host=host):
            return _host(np.asarray(x, dtype=np.float32))

        return as_float, True

    def device_preprocess(self) -> Callable:
        """jnp twin of :meth:`preprocess`'s function, for fusing the
        normalization into the jitted step (compact uint8 transfers ship
        raw pixels and normalize on device)."""
        import jax.numpy as jnp

        return _make_preprocess(self.preprocess_mode, jnp)

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
