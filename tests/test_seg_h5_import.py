"""Decoder-inclusive .h5 import for the three pretrained segmentation
families (reference model.py:95-148 mobile_net, :320-366 res_net,
:368-407 eff_net): a freshly built reference-architecture Keras model
round-trips through load_keras_variables with >=99.9% argmax agreement.

The models are built at a multiple-of-32 input so the reference's dynamic
pad/crop Lambdas are identity and can be omitted.
"""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from page_segmentation_tpu.models.efficientnet import EffNetSeg
from page_segmentation_tpu.models.h5_import import load_keras_variables
from page_segmentation_tpu.models.mobilenet import MobileNetSeg
from page_segmentation_tpu.models.registry import Architecture
from page_segmentation_tpu.models.resnet import ResNet50Seg

# oracle builders are shared with the export gates and the export-manifest
# generator (tools/gen_h5_export_manifests.py)
from tests.keras_oracles import HW, N_CLASSES, keras_eff_net, keras_mobile_net, keras_res_net

CASES = {
    "mobile_net": (keras_mobile_net, Architecture.MOBILE_NET, lambda: MobileNetSeg(n_classes=N_CLASSES)),
    "image_res_net": (keras_res_net, Architecture.RES_NET, lambda: ResNet50Seg(n_classes=N_CLASSES)),
    "effb0": (keras_eff_net, Architecture.EFFNETB0, lambda: EffNetSeg(n_classes=N_CLASSES, variant="effb0")),
    # B1 = the reference's actual eff_net default (model.py:368 efnet=EfficientNetB1)
    "effb1": (
        lambda: keras_eff_net(tf.keras.applications.EfficientNetB1),
        Architecture.EFFNETB1,
        lambda: EffNetSeg(n_classes=N_CLASSES, variant="effb1"),
    ),
    # the loaders are variant-generic (width/depth scaling inferred from the
    # weight structure); gate a middle variant and the largest one so the
    # whole B0-B7 family is covered by interpolation
    "effb3": (
        lambda: keras_eff_net(tf.keras.applications.EfficientNetB3),
        Architecture.EFFNETB3,
        lambda: EffNetSeg(n_classes=N_CLASSES, variant="effb3"),
    ),
    "effb7": (
        lambda: keras_eff_net(tf.keras.applications.EfficientNetB7),
        Architecture.EFFNETB7,
        lambda: EffNetSeg(n_classes=N_CLASSES, variant="effb7"),
    ),
}


def _calibrate_bn(model, x):
    """One pass of BN moving-stat calibration on ``x``.

    Untrained BN (mean 0, var 1) lets deep random-weight residual chains
    amplify chaotically (EffNet-B7 reaches 1e6 activations at 96x96, and
    fp drift destroys argmax agreement); setting each BN's moving stats to
    the actual input statistics keeps every activation O(1) — and makes
    the roundtrip exercise non-trivial moving means/variances.  Exactly
    one pass: re-calibrating on already-normalized activations divides
    near-constant channels by their tiny variance and re-explodes.
    """
    bns = [l for l in model.layers if isinstance(l, tf.keras.layers.BatchNormalization)]
    if not bns:
        return
    probe = tf.keras.Model(model.input, [bn.input for bn in bns])
    for bn, act in zip(bns, probe(x, training=False)):
        arr = np.asarray(act, np.float64)
        axes = tuple(range(arr.ndim - 1))
        gamma, beta = bn.get_weights()[:2]
        mean = arr.mean(axes).astype(np.float32)
        var = np.maximum(arr.var(axes), 1e-6).astype(np.float32)
        bn.set_weights([gamma, beta, mean, var])


@pytest.mark.parametrize("name", list(CASES))
def test_seg_model_h5_roundtrip(name, tmp_path):
    build_keras, arch, build_flax = CASES[name]
    keras_model = build_keras()

    rng = np.random.RandomState(0)
    x = (rng.rand(1, HW, HW, 3) * 255).astype(np.float32)

    if name in ("effb3", "effb7"):
        _calibrate_bn(keras_model, x)

    path = str(tmp_path / f"{name}.h5")
    keras_model.save(path)

    variables, detected = load_keras_variables(path, arch, N_CLASSES)
    assert detected == arch

    module = build_flax()
    init = module.init(jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)))
    missing = set(init["params"]) - set(variables["params"])
    assert not missing, f"unmapped modules: {missing}"

    ours = np.asarray(module.apply(variables, jnp.asarray(x), train=False))
    theirs = np.asarray(keras_model(x, training=False))
    assert ours.shape == theirs.shape

    agreement = (ours.argmax(-1) == theirs.argmax(-1)).mean()
    assert agreement >= 0.999, f"{name}: argmax agreement {agreement:.5f}"
    # deeper variants accumulate more conv-order float drift at logit
    # magnitudes of ~60; the argmax gate above is the parity criterion
    atol = 0.25 if name in ("effb3", "effb7") else 0.05
    np.testing.assert_allclose(ours, theirs, atol=atol)
    # a systematic scale error in the importer would be proportional to
    # the logit magnitude and could hide inside the absolute tolerance on
    # small-magnitude outputs; bound the *relative* energy of the error
    rel = np.linalg.norm(ours - theirs) / max(np.linalg.norm(theirs), 1e-12)
    assert rel < 1e-3, f"{name}: relative logit error {rel:.2e}"


def test_pretrained_encoder_finetune_flow(tmp_path):
    """User-supplied keras-applications backbone .h5 -> Trainer: the encoder
    starts from the file's weights, the decoder from fresh init, and one
    training epoch runs (the reference's weights='imagenet' equivalent,
    model.py:101)."""
    from page_segmentation_tpu.core.colors import ColorMap
    from page_segmentation_tpu.data.dataset import Dataset, SingleData
    from page_segmentation_tpu.models.mobilenet_import import load_mobilenet_encoder_h5
    from page_segmentation_tpu.train.metrics import Monitor
    from page_segmentation_tpu.train.trainer import Trainer, TrainSettings

    tf.keras.utils.set_random_seed(11)
    backbone = tf.keras.applications.MobileNetV2(weights=None, include_top=False, input_shape=(HW, HW, 3))
    path = str(tmp_path / "backbone.h5")
    backbone.save(path)

    cmap = ColorMap({"(255, 255, 255)": (0, "background"), "(255, 0, 0)": (1, "text")})
    rng = np.random.RandomState(0)
    pages = []
    for _ in range(2):
        mask = np.zeros((HW, HW), np.uint8)
        mask[20:70, 20:70] = 1
        image = np.where(mask == 1, 200, 30).astype(np.uint8)
        pages.append(SingleData(image=image, binary=(mask == 1).astype(np.uint8), mask=mask))
    data = Dataset(pages, cmap)

    trainer = Trainer(
        TrainSettings(
            n_epoch=1,
            n_classes=2,
            l_rate=1e-4,
            train_data=data,
            validation_data=None,
            output_dir=str(tmp_path / "out"),
            display=10,
            threads=1,
            architecture=Architecture.MOBILE_NET,
            monitor=Monitor.LOSS,
            early_stopping_max_performance_drops=0,
            reduce_lr_on_plateau=False,
            pretrained_encoder=path,
        )
    )
    # encoder weights come from the file
    enc_params, _ = load_mobilenet_encoder_h5(path)
    got = np.asarray(trainer.params["encoder"]["stem"]["conv"]["kernel"])
    np.testing.assert_allclose(got, enc_params["stem"]["conv"]["kernel"], atol=1e-6)
    history = trainer.train()
    assert np.isfinite(history["loss"][0])
