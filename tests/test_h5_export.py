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


def test_save_keras_h5_rejects_bn_families(tmp_path):
    with pytest.raises(NotImplementedError):
        save_keras_h5(str(tmp_path / "x.h5"), {}, Architecture.MOBILE_NET)


# ------------------------------------------------------- BN-family export
#
# The reference checkpoints every architecture as .h5 (reference
# network.py:177-183); these gates prove models trained here on the
# pretrained families hand back to reference-era tooling: export ->
# real-Keras `load_weights` (by order) -> >=99.9% argmax agreement, plus
# a roundtrip through our own importer.

N_CLASSES = 3
HW = 96


def _family_cases():
    from page_segmentation_tpu.models.efficientnet import EffNetSeg
    from page_segmentation_tpu.models.mobilenet import MobileNetSeg
    from page_segmentation_tpu.models.resnet import ResNet50Seg

    import tensorflow as tf
    from tests.keras_oracles import EFFNET_BUILDERS, keras_mobile_net, keras_res_net

    return {
        "mobile_net": (Architecture.MOBILE_NET,
                       lambda: MobileNetSeg(n_classes=N_CLASSES), keras_mobile_net),
        "image_res_net": (Architecture.RES_NET,
                          lambda: ResNet50Seg(n_classes=N_CLASSES), keras_res_net),
        "effb0": (Architecture.EFFNETB0,
                  lambda: EffNetSeg(n_classes=N_CLASSES, variant="effb0"),
                  EFFNET_BUILDERS["effb0"]),
        # B1 = the reference's actual eff_net default (model.py:368)
        "effb1": (Architecture.EFFNETB1,
                  lambda: EffNetSeg(n_classes=N_CLASSES, variant="effb1"),
                  EFFNET_BUILDERS["effb1"]),
    }


@pytest.mark.parametrize("name", ["mobile_net", "image_res_net", "effb0", "effb1"])
def test_family_export_loads_into_real_keras(name, tmp_path):
    tf = pytest.importorskip("tensorflow")
    from page_segmentation_tpu.models.h5_export import save_keras_variables
    from page_segmentation_tpu.models.h5_import import load_keras_variables

    arch, build_flax, build_keras = _family_cases()[name]
    module = build_flax()
    variables = module.init(jax.random.PRNGKey(3), jnp.zeros((1, HW, HW, 3)))
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    path = str(tmp_path / f"{name}.h5")
    save_keras_variables(path, variables, arch)

    keras_model = build_keras()
    keras_model.load_weights(path)

    rng = np.random.RandomState(0)
    x = (rng.rand(1, HW, HW, 3) * 255).astype(np.float32)
    ours = np.asarray(module.apply(variables, jnp.asarray(x), train=False))
    theirs = np.asarray(keras_model(x, training=False))
    assert ours.shape == theirs.shape
    agreement = (ours.argmax(-1) == theirs.argmax(-1)).mean()
    assert agreement >= 0.999, f"{name}: argmax agreement {agreement:.5f}"
    rel = np.linalg.norm(ours - theirs) / max(np.linalg.norm(theirs), 1e-12)
    assert rel < 1e-3, f"{name}: relative logit error {rel:.2e}"

    # roundtrip through our own importer: every exported weight must come
    # back identical (modulo the deliberately-dropped block_16 project BN
    # for mobile_net, whose fresh-init stats fold to a 1/sqrt(1+eps) scale)
    imported, detected = load_keras_variables(path, arch, N_CLASSES)
    re_ours = np.asarray(build_flax().apply(imported, jnp.asarray(x), train=False))
    re_agree = (ours.argmax(-1) == re_ours.argmax(-1)).mean()
    assert re_agree >= 0.999, f"{name}: importer roundtrip agreement {re_agree:.5f}"
