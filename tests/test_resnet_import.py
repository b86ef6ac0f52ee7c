"""ResNet50 encoder weight import: feature-map parity vs Keras."""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from page_segmentation_tpu.models.resnet import ResNet50Encoder, ResNet50Seg
from page_segmentation_tpu.models.resnet_import import (
    load_into_resnet_seg,
    load_resnet50_encoder_h5,
)

SKIPS = [
    "conv1_relu",
    "conv2_block3_out",
    "conv3_block4_out",
    "conv4_block6_out",
    "conv5_block3_out",
]


@pytest.fixture(scope="module")
def keras_backbone(tmp_path_factory):
    model = tf.keras.applications.ResNet50(weights=None, include_top=False, input_shape=(64, 64, 3))
    path = str(tmp_path_factory.mktemp("r50") / "backbone.h5")
    model.save(path)
    return model, path


def test_encoder_feature_parity(keras_backbone):
    model, path = keras_backbone
    params, stats = load_resnet50_encoder_h5(path)

    encoder = ResNet50Encoder()
    init = encoder.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    missing = set(init["params"]) - set(params)
    assert not missing, f"unmapped modules: {missing}"

    rng = np.random.RandomState(0)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    skips = encoder.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)

    extractor = tf.keras.Model(model.input, [model.get_layer(n).output for n in SKIPS])
    keras_skips = extractor(x, training=False)

    for index, (mine, theirs) in enumerate(zip(skips, keras_skips)):
        theirs = np.asarray(theirs)
        mine = np.asarray(mine)
        assert mine.shape == theirs.shape, (index, mine.shape, theirs.shape)
        np.testing.assert_allclose(mine, theirs, atol=5e-3)


def test_load_into_seg_model(keras_backbone):
    _, path = keras_backbone
    seg = ResNet50Seg(n_classes=2)
    variables = dict(seg.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    loaded = load_into_resnet_seg(variables, path)
    out = seg.apply(loaded, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 2)
