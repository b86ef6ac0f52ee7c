"""AOT export artifact (inference/aot.py): round-trip, shape handling, CLI.

The artifact must reproduce the in-process forward exactly (same program,
weights baked as constants) for arbitrary page shapes via the symbolic
export, and for the static-shape fallback; the CLI `export` command must
produce a loadable artifact from a saved checkpoint.
"""
import os
import zipfile

import numpy as np
import pytest

from page_segmentation_tpu.inference.aot import (
    AotClassifier,
    export_classifier,
)
from page_segmentation_tpu.inference.classifier import PixelClassifier
from page_segmentation_tpu.models.registry import Architecture


@pytest.fixture(scope="module")
def fcn_classifier():
    return PixelClassifier(n_classes=3, architecture=Architecture.FCN_SKIP, seed=3)


def _reference_pred(classifier, images):
    import jax.numpy as jnp

    x = jnp.asarray(images, jnp.float32)[..., None] / 255.0
    logits = classifier.module.apply(classifier.variables, x)
    return np.asarray(jnp.argmax(logits, -1), np.uint8)


def test_symbolic_roundtrip_many_shapes(tmp_path, fcn_classifier):
    path = str(tmp_path / "model.psx")
    manifest = export_classifier(fcn_classifier, path, platforms=("cpu",))
    assert manifest["symbolic"] and manifest["output"] == "pred"
    aot = AotClassifier(path)
    rng = np.random.RandomState(0)
    for shape in [(1, 64, 48), (2, 96, 80), (3, 32, 120)]:
        images = rng.randint(0, 256, shape, np.uint8)
        np.testing.assert_array_equal(
            aot.predict(images), _reference_pred(fcn_classifier, images)
        )


def test_pad_and_crop_non_multiple_shapes(tmp_path, fcn_classifier):
    path = str(tmp_path / "model.psx")
    export_classifier(fcn_classifier, path, platforms=("cpu",))
    aot = AotClassifier(path)
    rng = np.random.RandomState(1)
    image = rng.randint(0, 256, (37, 53), np.uint8)  # not stride multiples
    out = aot.predict(image)
    assert out.shape == (37, 53) and out.dtype == np.uint8
    # padding must not change the crop region vs padding done by the caller
    padded = np.pad(image, ((0, 3), (0, 3)))
    np.testing.assert_array_equal(
        out, _reference_pred(fcn_classifier, padded[None])[0, :37, :53]
    )


def test_logits_output(tmp_path, fcn_classifier):
    import jax.numpy as jnp

    path = str(tmp_path / "logits.psx")
    export_classifier(fcn_classifier, path, output="logits", platforms=("cpu",))
    aot = AotClassifier(path)
    image = np.random.RandomState(2).randint(0, 256, (64, 48), np.uint8)
    logits = aot.predict(image)
    assert logits.shape == (64, 48, 3) and logits.dtype == np.float32
    x = jnp.asarray(image, jnp.float32)[None, ..., None] / 255.0
    ref = np.asarray(fcn_classifier.module.apply(fcn_classifier.variables, x))[0]
    np.testing.assert_allclose(logits, ref, atol=1e-5)


def test_static_shapes_mode(tmp_path, fcn_classifier):
    path = str(tmp_path / "static.psx")
    manifest = export_classifier(
        fcn_classifier, path, platforms=("cpu",), shapes=[(64, 48), (96, 96)]
    )
    assert not manifest["symbolic"]
    aot = AotClassifier(path)
    rng = np.random.RandomState(3)
    # exact fit and pad-up-to-next-exported-shape (70x50 -> 96x96)
    for shape in [(64, 48), (70, 50)]:
        image = rng.randint(0, 256, shape, np.uint8)
        out = aot.predict(image)
        assert out.shape == shape
    with pytest.raises(ValueError, match="no exported shape fits"):
        aot.predict(rng.randint(0, 256, (200, 200), np.uint8))
    with pytest.raises(ValueError, match="stride factor"):
        export_classifier(fcn_classifier, path, platforms=("cpu",), shapes=[(65, 48)])


def test_rgb_family_export(tmp_path):
    """BN/RGB encoder family: gray replication + caffe/tf/torch
    normalization must fuse into the artifact (device_preprocess twin)."""
    clf = PixelClassifier(n_classes=3, architecture=Architecture.MOBILE_NET, seed=0)
    path = str(tmp_path / "mnet.psx")
    export_classifier(clf, path, platforms=("cpu",))
    aot = AotClassifier(path)
    image = np.random.RandomState(4).randint(0, 256, (64, 64), np.uint8)
    out = aot.predict(image)
    assert out.shape == (64, 64)
    import jax.numpy as jnp

    x = jnp.stack([jnp.asarray(image, jnp.float32)] * 3, -1)[None]
    x = clf.architecture.device_preprocess()(x)
    ref = np.asarray(jnp.argmax(clf.module.apply(clf.variables, x), -1), np.uint8)[0]
    np.testing.assert_array_equal(out, ref)


def test_artifact_is_self_contained(tmp_path, fcn_classifier):
    """The zip must carry manifest + program and reject foreign files."""
    path = str(tmp_path / "model.psx")
    export_classifier(fcn_classifier, path, platforms=("cpu",))
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
    assert names == {"manifest.json", "program.jaxexp"}
    bogus = str(tmp_path / "bogus.psx")
    with zipfile.ZipFile(bogus, "w") as zf:
        zf.writestr("manifest.json", "{}")
    with pytest.raises(ValueError, match="artifact"):
        AotClassifier(bogus)


def test_cli_export_from_checkpoint(tmp_path, fcn_classifier):
    """`export` CLI: checkpoint -> artifact -> same predictions."""
    from page_segmentation_tpu.cli.main import main
    from page_segmentation_tpu.train.checkpoint import save_checkpoint

    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(
        ckpt, fcn_classifier.variables, {"architecture": "fcn_skip", "n_classes": 3}
    )
    artifact = str(tmp_path / "model.psx")
    rc = main(
        [
            "export",
            "--load", ckpt,
            "--output", artifact,
            "--n_classes", "3",
            "--platforms", "cpu",
        ]
    )
    assert rc == 0 and os.path.exists(artifact)
    aot = AotClassifier(artifact)
    image = np.random.RandomState(5).randint(0, 256, (64, 48), np.uint8)
    np.testing.assert_array_equal(
        aot.predict(image), _reference_pred(fcn_classifier, image[None])[0]
    )
