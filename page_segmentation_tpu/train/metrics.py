"""In-graph losses & metrics (jnp), formula-parity with reference metrics.py.

All objectives take raw ``logits`` (N, H, W, C) and integer ``labels``
(N, H, W) or (N, H, W, 1):

* ``loss``: mean sparse softmax CE from logits (reference :8-9)
* ``accuracy``: mean(labels == argmax logits) (reference :12-17)
* ``jacard_coef``/``dice_coef``: softmax, one-hot, +100 smoothing
  (reference :60-89); their losses are mean(-log(coef)) per class, matching
  Keras' post-hoc mean reduction.
* ``categorical_hinge`` (reference :92-98), ``categorical_focal_loss``
  (reference :106-112 — note the reference applies the focal formula to raw
  logits clipped to (eps, 1-eps); we replicate the *behavior*),
  ``dice_and_categorical`` (reference :101-103).
* ``fgpa``/``fgpl``: foreground-masked accuracy/loss given the binary image
  (reference :20-57).

Design delta vs the reference: padding lives *outside* the jitted model
(static bucketed shapes), so every objective accepts an optional ``weights``
map (N, H, W) zeroing padded pixels.  With ``weights=None`` the formulas are
bitwise the reference's; with weights they are the same formulas restricted
to valid pixels, which is exactly what the reference computes on its
unpadded batch-of-1.
"""
from __future__ import annotations

import enum

import jax
import jax.numpy as jnp

EPSILON = 1e-7  # tf.keras.backend.epsilon()


def _squeeze_labels(labels):
    if labels.ndim == 4 and labels.shape[-1] == 1:
        labels = labels[..., 0]
    return labels.astype(jnp.int32)


def _wmean(values, weights):
    if weights is None:
        return jnp.mean(values)
    weights = weights.astype(values.dtype)
    return jnp.sum(values * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def sparse_softmax_ce(labels, logits):
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -ll


def loss(labels, logits, weights=None):
    return _wmean(sparse_softmax_ce(_squeeze_labels(labels), logits), weights)


def accuracy(labels, logits, weights=None):
    labels = _squeeze_labels(labels)
    correct = (labels == jnp.argmax(logits, axis=-1)).astype(jnp.float32)
    return _wmean(correct, weights)


def page_validity(weights):
    """Per-page 0/1 validity from a padding-weights map (None -> None).

    Batch rows that are pure mesh padding (weights all zero) must not
    contribute to per-page-mean metrics."""
    if weights is None:
        return None
    return (jnp.sum(weights.astype(jnp.float32), axis=(1, 2)) > 0).astype(jnp.float32)


def _valid_page_mean(per_page, valid):
    """Mean over pages, restricted to valid ones when a mask is given."""
    if valid is None:
        return jnp.mean(per_page, axis=0)
    shaped = valid.reshape((-1,) + (1,) * (per_page.ndim - 1))
    return jnp.sum(per_page * shaped, axis=0) / jnp.maximum(jnp.sum(valid), 1.0)


def fgpa(labels, logits, binary, weights=None):
    """Foreground pixel accuracy (reference metrics.py:36-57)."""
    labels = _squeeze_labels(labels)
    if binary.ndim == 4 and binary.shape[-1] == 1:
        binary = binary[..., 0]
    equals = (labels == jnp.argmax(logits, axis=-1)).astype(jnp.float32)
    fg = binary.astype(jnp.float32)
    if weights is not None:
        fg = fg * weights.astype(jnp.float32)
    correct = jnp.sum(equals * fg, axis=(1, 2))
    total = jnp.sum(fg, axis=(1, 2))
    return _valid_page_mean(correct / jnp.maximum(total, 1.0), page_validity(weights))


def fgpl(labels, logits, binary, weights=None):
    """Foreground-masked CE (reference metrics.py:20-33: labels and logits
    are multiplied by the binary before the CE)."""
    labels = _squeeze_labels(labels)
    if binary.ndim == 4 and binary.shape[-1] == 1:
        binary = binary[..., 0]
    fg = binary.astype(jnp.float32)
    masked_labels = (labels.astype(jnp.float32) * fg).astype(jnp.int32)
    masked_logits = logits * fg[..., None]
    return _wmean(sparse_softmax_ce(masked_labels, masked_logits), weights)


def _soft_one_hot(labels, logits, weights):
    n_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(_squeeze_labels(labels), n_classes, dtype=probs.dtype)
    if weights is not None:
        w = weights.astype(probs.dtype)[..., None]
        probs = probs * w
        one_hot = one_hot * w
    return one_hot, probs


def jacard_coef(labels, logits, smooth: float = 100.0, weights=None):
    one_hot, probs = _soft_one_hot(labels, logits, weights)
    intersection = jnp.sum(jnp.abs(one_hot * probs), axis=(1, 2))
    union_sum = jnp.sum(jnp.abs(one_hot + probs), axis=(1, 2))
    jac = (intersection + smooth) / (union_sum - intersection + smooth)
    # per-class, like the reference; padding-only pages excluded (their
    # coefficient is the degenerate smooth/smooth = 1)
    return _valid_page_mean(jac, page_validity(weights))


def jacard_coef_loss(labels, logits, weights=None):
    return jnp.mean(-jnp.log(jacard_coef(labels, logits, weights=weights)))


def dice_coef(labels, logits, smooth: float = 100.0, weights=None):
    one_hot, probs = _soft_one_hot(labels, logits, weights)
    intersection = jnp.sum(jnp.abs(one_hot * probs), axis=(1, 2))
    union_sum = jnp.sum(jnp.abs(one_hot + probs), axis=(1, 2))
    dice = (2.0 * intersection + smooth) / (union_sum + smooth)
    return _valid_page_mean(dice, page_validity(weights))


def dice_coef_loss(labels, logits, weights=None):
    return jnp.mean(-jnp.log(dice_coef(labels, logits, weights=weights)))


def categorical_hinge(labels, logits, weights=None):
    n_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(_squeeze_labels(labels), n_classes, dtype=logits.dtype)
    pos = jnp.sum(one_hot * logits, axis=-1)
    neg = jnp.max((1.0 - one_hot) * logits, axis=-1)
    return _wmean(jnp.maximum(0.0, neg - pos + 1.0), weights)


def dice_and_categorical(labels, logits, alpha: float = 1.0, weights=None):
    assert 0 <= alpha <= 1
    return (
        alpha * dice_coef_loss(labels, logits, weights=weights)
        + (1 - alpha) * loss(labels, logits, weights=weights)
    ) / 2


def categorical_focal_loss(labels, logits, gamma: float = 2.0, alpha: float = 0.25, weights=None):
    # behavioral parity: the reference feeds *logits* through the focal
    # probability formula after clipping (metrics.py:106-112)
    n_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(_squeeze_labels(labels), n_classes, dtype=logits.dtype)
    y_pred = jnp.clip(logits, EPSILON, 1.0 - EPSILON)
    focal = -one_hot * (alpha * jnp.power(1.0 - y_pred, gamma) * jnp.log(y_pred))
    if weights is not None:
        # normalize by valid elements only — a plain mean would shrink the
        # loss with the padding fraction of the bucketed batch
        w = weights.astype(focal.dtype)[..., None]
        return jnp.sum(focal * w) / jnp.maximum(jnp.sum(w) * n_classes, 1.0) * 100.0
    return jnp.mean(focal) * 100.0


class Loss(enum.Enum):
    CATEGORICAL_CROSSENTROPY = "categorical_crossentropy"
    JACCARD_LOSS = "jaccard"
    DICE_LOSS = "dice"
    CATEGORICAL_HINGE = "categorical_hinge"
    CATEGORCAL_FOCAL = "categorical_focal"
    DICE_AND_CROSSENTROPY = "dice_and_crossentropy"

    def __call__(self):
        return {
            Loss.CATEGORICAL_CROSSENTROPY: loss,
            Loss.JACCARD_LOSS: jacard_coef_loss,
            Loss.DICE_LOSS: dice_coef_loss,
            Loss.CATEGORICAL_HINGE: categorical_hinge,
            Loss.CATEGORCAL_FOCAL: categorical_focal_loss,
            Loss.DICE_AND_CROSSENTROPY: dice_and_categorical,
        }[self]


class Monitor(enum.Enum):
    VAL_LOSS = "val_loss"
    VAL_ACCURACY = "val_accuracy"
    ACCURACY = "accuracy"
    LOSS = "loss"
    DICE_COEF = "dice_coef"
    JACRAD_COEF = "jacard_coef"
    FGPA = "fgpa"

    @property
    def mode(self) -> str:
        """'min' if lower is better."""
        return "min" if "loss" in self.value else "max"

    @property
    def is_validation(self) -> bool:
        return self.value.startswith("val_")
