"""TF parity for the UNet / ResUNet .h5 import orderings."""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp

from page_segmentation_tpu.models.h5_import import load_keras_h5
from page_segmentation_tpu.models.registry import Architecture


def _keras_unet(n_classes, input_shape=(32, 32, 1)):
    L = tf.keras.layers
    inp = L.Input(input_shape)
    conv1 = L.Conv2D(64, 3, activation="relu", padding="same")(inp)
    conv1 = L.Conv2D(64, 3, activation="relu", padding="same")(conv1)
    pool1 = L.MaxPooling2D(pool_size=(2, 2))(conv1)
    conv2 = L.Conv2D(128, 3, activation="relu", padding="same")(pool1)
    conv2 = L.Conv2D(128, 3, activation="relu", padding="same")(conv2)
    pool2 = L.MaxPooling2D(pool_size=(2, 2))(conv2)
    conv3 = L.Conv2D(256, 3, activation="relu", padding="same")(pool2)
    conv3 = L.Conv2D(256, 3, activation="relu", padding="same")(conv3)
    pool3 = L.MaxPooling2D(pool_size=(2, 2))(conv3)
    conv4 = L.Conv2D(512, 3, activation="relu", padding="same")(pool3)
    conv4 = L.Conv2D(512, 3, activation="relu", padding="same")(conv4)
    drop4 = L.Dropout(0.5)(conv4)
    pool4 = L.MaxPooling2D(pool_size=(2, 2))(drop4)
    conv5 = L.Conv2D(1024, 3, activation="relu", padding="same")(pool4)
    conv5 = L.Conv2D(1024, 3, activation="relu", padding="same")(conv5)
    drop5 = L.Dropout(0.5)(conv5)
    up6 = L.Conv2D(512, 2, activation="relu", padding="same")(L.UpSampling2D(size=(2, 2))(drop5))
    merge6 = L.concatenate([drop4, up6], axis=3)
    conv6 = L.Conv2D(512, 3, activation="relu", padding="same")(merge6)
    conv6 = L.Conv2D(512, 3, activation="relu", padding="same")(conv6)
    up7 = L.Conv2D(256, 2, activation="relu", padding="same")(L.UpSampling2D(size=(2, 2))(conv6))
    merge7 = L.concatenate([conv3, up7], axis=3)
    conv7 = L.Conv2D(256, 3, activation="relu", padding="same")(merge7)
    conv7 = L.Conv2D(256, 3, activation="relu", padding="same")(conv7)
    up8 = L.Conv2D(128, 2, activation="relu", padding="same")(L.UpSampling2D(size=(2, 2))(conv7))
    merge8 = L.concatenate([conv2, up8], axis=3)
    conv8 = L.Conv2D(128, 3, activation="relu", padding="same")(merge8)
    conv8 = L.Conv2D(128, 3, activation="relu", padding="same")(conv8)
    up9 = L.Conv2D(64, 2, activation="relu", padding="same")(L.UpSampling2D(size=(2, 2))(conv8))
    merge9 = L.concatenate([conv1, up9], axis=3)
    conv9 = L.Conv2D(64, 3, activation="relu", padding="same")(merge9)
    conv9 = L.Conv2D(64, 3, activation="relu", padding="same")(conv9)
    logits = L.Conv2D(n_classes, 1, 1, name="logits", padding="valid")(conv9)
    return tf.keras.models.Model(inp, logits, name="unet")


def _keras_res_unet(n_classes, input_shape=(32, 32, 1)):
    L = tf.keras.layers

    def bn_act(x, act=True):
        return L.Activation("relu")(x) if act else x

    def conv_block(x, filters, strides=1):
        return L.Conv2D(filters, 3, padding="same", strides=strides)(bn_act(x))

    def residual_block(x, filters, strides=1):
        res = conv_block(x, filters, strides)
        res = conv_block(res, filters, 1)
        shortcut = bn_act(L.Conv2D(filters, 3, padding="same", strides=strides)(x), act=False)
        return L.Add()([shortcut, res])

    def stem(x, filters):
        conv = L.Conv2D(filters, 3, padding="same")(x)
        conv = conv_block(conv, filters)
        shortcut = bn_act(L.Conv2D(filters, 1, padding="same")(x), act=False)
        return L.Add()([conv, shortcut])

    f = [32, 64, 128, 256, 512]
    inp = L.Input(input_shape)
    e1 = stem(inp, f[0])
    e2 = residual_block(e1, f[1], strides=2)
    e3 = residual_block(e2, f[2], strides=2)
    e4 = residual_block(e3, f[3], strides=2)
    e5 = residual_block(e4, f[4], strides=2)
    b0 = conv_block(e5, f[4])
    b1 = conv_block(b0, f[4])

    def up(x, skip):
        return L.Concatenate()([L.UpSampling2D((2, 2))(x), skip])

    d1 = residual_block(up(b1, e4), f[4])
    d2 = residual_block(up(d1, e3), f[3])
    d3 = residual_block(up(d2, e2), f[2])
    d4 = residual_block(up(d3, e1), f[1])
    out = L.Conv2D(n_classes, (1, 1), padding="valid", name="logits")(d4)
    return tf.keras.models.Model(inp, out, name="res_unet")


@pytest.mark.parametrize(
    "builder,arch",
    [
        (_keras_unet, Architecture.UNET),
        (_keras_res_unet, Architecture.RES_UNET),
    ],
)
def test_h5_import_parity(builder, arch, tmp_path):
    n_classes = 3
    keras_model = builder(n_classes)
    h5_path = str(tmp_path / "model.h5")
    keras_model.save(h5_path)

    rng = np.random.RandomState(0)
    image = rng.rand(1, 32, 32, 1).astype(np.float32)
    tf_logits = keras_model(image, training=False).numpy()

    params, detected = load_keras_h5(h5_path, arch, n_classes)
    assert detected == arch
    module = arch.model(n_classes)
    jax_logits = np.asarray(module.apply({"params": params}, jnp.asarray(image)))

    np.testing.assert_allclose(jax_logits, tf_logits, atol=5e-4)
    assert (jax_logits.argmax(-1) == tf_logits.argmax(-1)).mean() >= 0.999
