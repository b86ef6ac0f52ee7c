"""MobileNetV2 encoder weight import: feature-map parity vs Keras."""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from page_segmentation_tpu.models.mobilenet import MobileNetSeg, MobileNetV2Encoder
from page_segmentation_tpu.models.mobilenet_import import (
    load_into_mobilenet_seg,
    load_mobilenet_encoder_h5,
)

SKIPS = [
    "block_1_expand_relu",
    "block_3_expand_relu",
    "block_6_expand_relu",
    "block_13_expand_relu",
]


@pytest.fixture(scope="module")
def keras_backbone(tmp_path_factory):
    model = tf.keras.applications.MobileNetV2(weights=None, include_top=False, input_shape=(96, 96, 3))
    path = str(tmp_path_factory.mktemp("mnv2") / "backbone.h5")
    model.save(path)
    return model, path


def test_encoder_feature_parity(keras_backbone):
    model, path = keras_backbone
    params, stats = load_mobilenet_encoder_h5(path)

    encoder = MobileNetV2Encoder()
    rng = np.random.RandomState(0)
    x = rng.rand(1, 96, 96, 3).astype(np.float32)

    # sanity: imported trees initialize cleanly against the module structure
    init = encoder.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
    missing = set(init["params"]) - set(params)
    assert not missing, f"unmapped modules: {missing}"

    skips = encoder.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)

    extractor = tf.keras.Model(model.input, [model.get_layer(n).output for n in SKIPS])
    keras_skips = extractor(x, training=False)

    for index, (mine, theirs) in enumerate(zip(skips[:4], keras_skips)):
        theirs = np.asarray(theirs)
        mine = np.asarray(mine)
        assert mine.shape == theirs.shape, (index, mine.shape, theirs.shape)
        np.testing.assert_allclose(mine, theirs, atol=2e-3)


def test_load_into_seg_model(keras_backbone):
    _, path = keras_backbone
    seg = MobileNetSeg(n_classes=3)
    variables = dict(seg.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3))))
    loaded = load_into_mobilenet_seg(variables, path)
    out = seg.apply(loaded, jnp.zeros((1, 96, 96, 3)))
    assert out.shape == (1, 96, 96, 3)
