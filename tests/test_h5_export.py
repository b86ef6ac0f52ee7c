"""Export flax -> Keras .h5 round trips (own importer + real Keras)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from page_segmentation_tpu.models.fcn import FCNSkip
from page_segmentation_tpu.models.h5_export import save_keras_h5
from page_segmentation_tpu.models.h5_import import load_keras_h5
from page_segmentation_tpu.models.registry import Architecture


def test_export_import_roundtrip(tmp_path):
    module = FCNSkip(n_classes=3)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1), jnp.float32))["params"]
    path = str(tmp_path / "model.h5")
    save_keras_h5(path, params, Architecture.FCN_SKIP)

    loaded, detected = load_keras_h5(path, Architecture.FCN_SKIP, 3)
    assert detected == Architecture.FCN_SKIP
    for layer in params:
        np.testing.assert_array_equal(np.asarray(params[layer]["kernel"]), loaded[layer]["kernel"])
        np.testing.assert_array_equal(np.asarray(params[layer]["bias"]), loaded[layer]["bias"])


def test_export_loads_into_real_keras(tmp_path):
    tf = pytest.importorskip("tensorflow")
    from tests.test_tf_parity import _keras_fcn_skip

    module = FCNSkip(n_classes=3)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1), jnp.float32))["params"]
    path = str(tmp_path / "model.h5")
    save_keras_h5(path, params, Architecture.FCN_SKIP)

    keras_model = _keras_fcn_skip(3, input_shape=(None, None, 1))
    keras_model.load_weights(path)

    rng = np.random.RandomState(0)
    image = rng.rand(1, 64, 64, 1).astype(np.float32)
    tf_logits = keras_model(image).numpy()
    jax_logits = np.asarray(module.apply({"params": params}, jnp.asarray(image)))
    np.testing.assert_allclose(jax_logits, tf_logits, atol=2e-4)
    assert (jax_logits.argmax(-1) == tf_logits.argmax(-1)).mean() >= 0.999


def test_export_unsupported_architecture(tmp_path):
    with pytest.raises(NotImplementedError):
        save_keras_h5(str(tmp_path / "x.h5"), {}, Architecture.MOBILE_NET)
