"""Reference-shaped Keras oracle builders for the three pretrained
segmentation families (reference model.py:95-148 unet_with_mobile_net_encoder,
:320-366 res_net_fine_tuning, :368-407 eff_net_fine_tuning).

Shared between the .h5 import parity tests (tests/test_seg_h5_import.py),
the export gates (tests/test_h5_export.py), and the export-manifest
generator (tools/gen_h5_export_manifests.py).  The models are built at a
multiple-of-32 input so the reference's dynamic pad/crop Lambdas are
identity and can be omitted.
"""
import tensorflow as tf

L = tf.keras.layers

N_CLASSES = 3
HW = 96


def conv_block_simple(prev, filters, prefix):
    conv = L.Conv2D(filters, (3, 3), padding="same", kernel_initializer="he_normal",
                    name=prefix + "_conv")(prev)
    return L.Activation("relu", name=prefix + "_activation")(conv)


def keras_mobile_net(hw=HW, n_classes=N_CLASSES):
    tf.keras.utils.set_random_seed(7)
    inp = L.Input((hw, hw, 3))
    base = tf.keras.applications.MobileNetV2(weights=None, include_top=False, input_tensor=inp)
    names = ['block_1_expand_relu', 'block_3_expand_relu', 'block_6_expand_relu',
             'block_13_expand_relu', 'block_16_project']
    down = tf.keras.Model(base.input, [base.get_layer(n).output for n in names])
    skips = down(inp)
    x = skips[-1]
    for f, skip in zip([512, 256, 128, 64], reversed(skips[:-1])):
        x = L.Conv2DTranspose(f, 3, strides=2, padding="same", activation=tf.nn.relu)(x)
        x = L.Concatenate()([x, skip])
    x = L.Conv2DTranspose(60, 3, strides=2, padding="same", activation=tf.nn.relu)(x)
    out = L.Conv2D(n_classes, 1, 1, name="logits", padding="valid")(x)
    return tf.keras.Model(inp, out, name="mobile_net")


def keras_res_net(hw=HW, n_classes=N_CLASSES):
    tf.keras.utils.set_random_seed(7)
    inp = L.Input((hw, hw, 3))
    base = tf.keras.applications.ResNet50(weights=None, include_top=False, input_tensor=inp)
    conv1 = base.get_layer("conv1_relu").output
    conv2 = base.get_layer("conv2_block3_out").output
    conv3 = base.get_layer("conv3_block4_out").output
    conv4 = base.get_layer("conv4_block6_out").output
    conv5 = base.get_layer("conv5_block3_out").output
    c5 = conv_block_simple(conv5, 256, "b_1")
    x = L.concatenate([L.UpSampling2D()(c5), conv4], axis=-1)
    x = conv_block_simple(x, 256, "conv6_1"); x = conv_block_simple(x, 256, "conv6_2")
    x = L.concatenate([L.UpSampling2D()(x), conv3], axis=-1)
    x = conv_block_simple(x, 192, "conv7_1"); x = conv_block_simple(x, 192, "conv7_2")
    x = L.concatenate([L.UpSampling2D()(x), conv2], axis=-1)
    x = conv_block_simple(x, 128, "conv8_1"); x = conv_block_simple(x, 128, "conv8_2")
    x = L.concatenate([L.UpSampling2D()(x), conv1], axis=-1)
    x = conv_block_simple(x, 64, "conv9_1"); x = conv_block_simple(x, 64, "conv9_2")
    x = L.concatenate([L.UpSampling2D()(x), inp], axis=-1)
    x = conv_block_simple(x, 32, "conv10_1"); x = conv_block_simple(x, 32, "conv10_2")
    out = L.Conv2D(n_classes, 1, 1, name="logits", padding="valid")(x)
    return tf.keras.Model(inp, out, name="image_res_net")


def keras_eff_net(builder=None, hw=HW, n_classes=N_CLASSES):
    tf.keras.utils.set_random_seed(7)
    inp = L.Input((hw, hw, 3))
    base = (builder or tf.keras.applications.EfficientNetB0)(
        weights=None, include_top=False, input_tensor=inp)
    # the reference uses the efn package whose models take externally
    # preprocessed input (architecture.py preprocess, torch mode);
    # tf.keras.applications adds an in-model Rescaling(1/255) — neutralize
    # it so this test model matches the reference convention (the
    # Normalization layer in this Keras build is already identity).
    # looked up by type: Keras layer auto-names are process-global counters
    for layer in base.layers:
        if type(layer).__name__ == "Rescaling":
            layer.scale = 1.0
    conv1 = base.get_layer("block2a_expand_activation").output
    conv2 = base.get_layer("block3a_expand_activation").output
    conv3 = base.get_layer("block4a_expand_activation").output
    conv4 = base.get_layer("block6a_expand_activation").output
    c4 = conv_block_simple(conv4, 256, "b_1")
    x = L.concatenate([L.UpSampling2D()(c4), conv3], axis=-1)
    x = conv_block_simple(x, 256, "conv6_1"); x = conv_block_simple(x, 256, "conv6_2")
    x = L.concatenate([L.UpSampling2D()(x), conv2], axis=-1)
    x = conv_block_simple(x, 196, "conv7_1"); x = conv_block_simple(x, 196, "conv7_2")
    x = L.concatenate([L.UpSampling2D()(x), conv1], axis=-1)
    x = conv_block_simple(x, 128, "conv8_1"); x = conv_block_simple(x, 128, "conv8_2")
    x = L.concatenate([L.UpSampling2D()(x), inp], axis=-1)
    x = conv_block_simple(x, 64, "conv9_1"); x = conv_block_simple(x, 64, "conv9_2")
    out = L.Conv2D(n_classes, 1, 1, name="logits", padding="valid")(x)
    return tf.keras.Model(inp, out, name="effb0")


EFFNET_BUILDERS = {
    "effb0": lambda hw=HW, n_classes=N_CLASSES: keras_eff_net(
        tf.keras.applications.EfficientNetB0, hw, n_classes),
    "effb1": lambda hw=HW, n_classes=N_CLASSES: keras_eff_net(
        tf.keras.applications.EfficientNetB1, hw, n_classes),
    "effb2": lambda hw=HW, n_classes=N_CLASSES: keras_eff_net(
        tf.keras.applications.EfficientNetB2, hw, n_classes),
    "effb3": lambda hw=HW, n_classes=N_CLASSES: keras_eff_net(
        tf.keras.applications.EfficientNetB3, hw, n_classes),
    "effb4": lambda hw=HW, n_classes=N_CLASSES: keras_eff_net(
        tf.keras.applications.EfficientNetB4, hw, n_classes),
    "effb5": lambda hw=HW, n_classes=N_CLASSES: keras_eff_net(
        tf.keras.applications.EfficientNetB5, hw, n_classes),
    "effb6": lambda hw=HW, n_classes=N_CLASSES: keras_eff_net(
        tf.keras.applications.EfficientNetB6, hw, n_classes),
    "effb7": lambda hw=HW, n_classes=N_CLASSES: keras_eff_net(
        tf.keras.applications.EfficientNetB7, hw, n_classes),
}
