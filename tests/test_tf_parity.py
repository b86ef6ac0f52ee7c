"""Numerical parity gate vs the TensorFlow reference semantics.

Builds the reference's fcn_skip architecture in tf.keras (the documented
channel plan: reference model.py:45-92), saves legacy .h5, imports the
weights into the flax FCNSkip, and checks:

* logits close (atol)
* per-pixel argmax agreement >= 99.9% (BASELINE.md north star)

The Lambda pad/crop of the reference are identity on multiple-of-32
inputs, so a fixed-size Keras input tests exactly the conv stack parity.
"""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from page_segmentation_tpu.models.fcn import FCN, FCNSkip
from page_segmentation_tpu.models.h5_import import load_keras_h5
from page_segmentation_tpu.models.registry import Architecture


def _keras_fcn_skip(n_classes, input_shape=(64, 64, 1)):
    # deterministic init: with unseeded glorot weights the argmax-agreement
    # gates hover around their threshold on near-tie pixels (flake)
    tf.keras.utils.set_random_seed(1234)
    L = tf.keras.layers
    inp = L.Input(input_shape)
    conv1 = L.Conv2D(20, (5, 5), padding="same", activation="relu")(inp)
    conv2 = L.Conv2D(30, (5, 5), padding="same", activation=None)(conv1)
    pool2 = L.MaxPooling2D((2, 2), (2, 2), padding="same")(conv2)
    conv3 = L.Conv2D(40, (5, 5), padding="same", activation="relu")(pool2)
    conv4 = L.Conv2D(40, (5, 5), padding="same", activation=None)(conv3)
    pool4 = L.MaxPooling2D((2, 2), (2, 2), padding="same")(conv4)
    conv5 = L.Conv2D(60, (5, 5), padding="same", activation="relu")(pool4)
    conv6 = L.Conv2D(60, (5, 5), padding="same", activation=None)(conv5)
    pool6 = L.MaxPooling2D((2, 2), (2, 2), padding="same")(conv6)
    conv7 = L.Conv2D(80, (5, 5), padding="same", activation="relu")(pool6)
    deconv1 = L.Conv2DTranspose(80, (5, 5), padding="same", activation="relu")(conv7)
    deconv2 = L.Conv2DTranspose(60, (2, 2), padding="same", strides=(2, 2), activation="relu")(deconv1)
    deconv2 = L.Concatenate(axis=-1)([deconv2, conv6])
    deconv3 = L.Conv2DTranspose(40, (5, 5), padding="same", activation="relu")(deconv2)
    deconv3 = L.Concatenate(axis=-1)([deconv3, conv5])
    deconv4 = L.Conv2DTranspose(30, (2, 2), padding="same", strides=(2, 2), activation="relu")(deconv3)
    deconv4 = L.Concatenate(axis=-1)([deconv4, conv3])
    deconv5 = L.Conv2DTranspose(20, (2, 2), padding="same", strides=(2, 2), activation=None)(deconv4)
    deconv5 = L.Concatenate(axis=-1)([deconv5, conv2])
    logits = L.Conv2D(n_classes, (1, 1), (1, 1), name="logits")(deconv5)
    return tf.keras.models.Model(inp, logits, name="fcn_skip")


def _keras_fcn(n_classes, input_shape=(64, 64, 1)):
    L = tf.keras.layers
    inp = L.Input(input_shape)
    x = L.Conv2D(20, (5, 5), padding="same", activation="relu")(inp)
    x = L.Conv2D(30, (5, 5), padding="same", activation=None)(x)
    x = L.MaxPooling2D((2, 2), (2, 2), padding="same")(x)
    x = L.Conv2D(40, (5, 5), padding="same", activation="relu")(x)
    x = L.Conv2D(40, (5, 5), padding="same", activation=None)(x)
    x = L.MaxPooling2D((2, 2), (2, 2), padding="same")(x)
    x = L.Conv2D(60, (5, 5), padding="same", activation="relu")(x)
    x = L.Conv2D(60, (5, 5), padding="same", activation=None)(x)
    x = L.MaxPooling2D((2, 2), (2, 2), padding="same")(x)
    x = L.Conv2D(80, (5, 5), padding="same", activation="relu")(x)
    x = L.Conv2DTranspose(80, (5, 5), padding="same", activation="relu")(x)
    x = L.Conv2DTranspose(60, (2, 2), padding="same", strides=(2, 2), activation="relu")(x)
    x = L.Conv2DTranspose(40, (5, 5), padding="same", activation="relu")(x)
    x = L.Conv2DTranspose(30, (2, 2), padding="same", strides=(2, 2), activation="relu")(x)
    x = L.Conv2DTranspose(20, (2, 2), padding="same", strides=(2, 2), activation=None)(x)
    logits = L.Conv2D(n_classes, (1, 1), (1, 1), name="logits")(x)
    return tf.keras.models.Model(inp, logits, name="fcn")


@pytest.mark.parametrize(
    "builder,module_cls,arch",
    [
        (_keras_fcn_skip, FCNSkip, Architecture.FCN_SKIP),
        (_keras_fcn, FCN, Architecture.FCN),
    ],
)
def test_h5_import_parity(builder, module_cls, arch, tmp_path):
    n_classes = 3
    keras_model = builder(n_classes)
    h5_path = str(tmp_path / "model.h5")
    keras_model.save(h5_path)

    rng = np.random.RandomState(0)
    # realistic input: inverted grayscale page / 255
    image = rng.rand(1, 64, 64, 1).astype(np.float32)

    tf_logits = keras_model(image).numpy()

    params, detected = load_keras_h5(h5_path, arch, n_classes)
    assert detected == arch  # model_config name detection
    module = module_cls(n_classes=n_classes)
    jax_logits = np.asarray(module.apply({"params": params}, jnp.asarray(image)))

    np.testing.assert_allclose(jax_logits, tf_logits, atol=2e-4)
    agreement = (jax_logits.argmax(-1) == tf_logits.argmax(-1)).mean()
    assert agreement >= 0.999, f"argmax agreement {agreement}"


def test_h5_import_via_classifier(tmp_path):
    """PixelClassifier(.h5) end-to-end: detection + prediction shape."""
    from page_segmentation_tpu.data.dataset import SingleData
    from page_segmentation_tpu.inference.classifier import PixelClassifier

    keras_model = _keras_fcn_skip(3, input_shape=(None, None, 1))
    h5_path = str(tmp_path / "model.h5")
    keras_model.save(h5_path)

    net = PixelClassifier(n_classes=3, model_path=h5_path)
    assert net.architecture == Architecture.FCN_SKIP

    rng = np.random.RandomState(0)
    image = (rng.rand(50, 70) * 255).astype(np.uint8)
    data = SingleData(image=image, binary=np.ones((50, 70), np.uint8))
    logit, prob, pred = net.predict_single_data(data)
    assert pred.shape == (50, 70)

    # cross-check against Keras on the same (padded) input
    arr = (image.astype(np.float32) / 255.0)[None, ..., None]
    padded = np.zeros((1, 56, 72, 1), np.float32)
    padded[:, :50, :70] = arr
    tf_pred = keras_model(padded).numpy()[0, :50, :70].argmax(-1)
    agreement = (pred == tf_pred).mean()
    assert agreement >= 0.999, f"argmax agreement {agreement}"
