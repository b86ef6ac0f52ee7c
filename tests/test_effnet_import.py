"""EfficientNetB0 encoder weight import: feature-map parity vs Keras."""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from page_segmentation_tpu.models.efficientnet import EffNetEncoder, EffNetSeg
from page_segmentation_tpu.models.efficientnet_import import (
    load_effnet_encoder_h5,
    load_into_effnet_seg,
)

SKIPS = [
    "block2a_expand_activation",
    "block3a_expand_activation",
    "block4a_expand_activation",
    "block6a_expand_activation",
]


@pytest.fixture(scope="module")
def keras_backbone(tmp_path_factory):
    model = tf.keras.applications.EfficientNetB0(
        weights=None, include_top=False, input_shape=(64, 64, 3)
    )
    path = str(tmp_path_factory.mktemp("effb0") / "backbone.h5")
    model.save(path)
    return model, path


def _keras_normalized_input(model, x_raw):
    """Apply the in-model Rescaling+Normalization to raw 0-255 input so both
    encoders see identical tensors."""
    stem_input = None
    h = x_raw
    for layer in model.layers:
        if layer.name == "stem_conv":
            break
        if layer.__class__.__name__ in ("Rescaling", "Normalization"):
            h = layer(h)
    return np.asarray(h)


def test_encoder_feature_parity(keras_backbone):
    model, path = keras_backbone
    params, stats = load_effnet_encoder_h5(path)

    encoder = EffNetEncoder(variant="effb0")
    init = encoder.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    missing = set(init["params"]) - set(params)
    assert not missing, f"unmapped modules: {missing}"
    extra = set(params) - set(init["params"])
    assert not extra, f"imported modules without a home: {extra}"

    rng = np.random.RandomState(0)
    x_raw = (rng.rand(1, 64, 64, 3) * 255).astype(np.float32)
    x_norm = _keras_normalized_input(model, x_raw)

    skips = encoder.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x_norm), train=False
    )
    extractor = tf.keras.Model(model.input, [model.get_layer(n).output for n in SKIPS])
    keras_skips = extractor(x_raw, training=False)

    for index, (mine, theirs) in enumerate(zip(skips[:4], keras_skips)):
        theirs = np.asarray(theirs)
        mine = np.asarray(mine)
        assert mine.shape == theirs.shape, (index, mine.shape, theirs.shape)
        np.testing.assert_allclose(mine, theirs, atol=5e-3)


def test_load_into_seg_model(keras_backbone):
    _, path = keras_backbone
    seg = EffNetSeg(n_classes=2, variant="effb0")
    variables = dict(seg.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    loaded = load_into_effnet_seg(variables, path)
    out = seg.apply(loaded, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 2)
