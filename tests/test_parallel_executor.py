import numpy as np
import jax
import pytest

from page_segmentation_tpu.inference.classifier import PixelClassifier
from page_segmentation_tpu.parallel.executor import ParallelPredictor
from page_segmentation_tpu.parallel.mesh import make_mesh


def test_parallel_predict_matches_single_device():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    net = PixelClassifier(n_classes=3)
    mesh = make_mesh(4)
    rng = np.random.RandomState(0)
    images = (rng.rand(8, 32, 32) * 255).astype(np.uint8)

    parallel = ParallelPredictor(net, mesh)
    pred = parallel.predict_batch(images)
    assert pred.shape == (8, 32, 32)

    # single-device oracle
    import jax.numpy as jnp

    x = (images.astype(np.float32) / 255.0)[..., None]
    logits = net.module.apply(net.variables, jnp.asarray(x))
    expected = np.asarray(jnp.argmax(logits, -1))
    np.testing.assert_array_equal(pred, expected)


def test_parallel_predict_ragged_batch():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    net = PixelClassifier(n_classes=2)
    mesh = make_mesh(4)
    images = (np.random.RandomState(1).rand(6, 32, 32) * 255).astype(np.uint8)
    pred = ParallelPredictor(net, mesh).predict_batch(images)
    assert pred.shape == (6, 32, 32)  # internal pad to 8, cropped back


def test_trainer_load_fallback(tmp_path):
    """A broken --load falls back to fresh init unless continue_training."""
    from page_segmentation_tpu.core.colors import ColorMap
    from page_segmentation_tpu.data.dataset import Dataset, SingleData
    from page_segmentation_tpu.train.metrics import Monitor
    from page_segmentation_tpu.train.trainer import Trainer, TrainSettings

    cmap = ColorMap({"(255, 255, 255)": (0, "bg"), "(255, 0, 0)": (1, "text")})
    mask = np.zeros((16, 16), np.uint8)
    mask[4:12, 4:12] = 1
    data = Dataset(
        [SingleData(image=(mask * 200).astype(np.uint8), binary=mask, mask=mask)], cmap
    )
    base = dict(
        n_epoch=1,
        n_classes=2,
        l_rate=1e-3,
        train_data=data,
        validation_data=None,
        display=1,
        output_dir=str(tmp_path / "o"),
        threads=1,
        monitor=Monitor.LOSS,
        early_stopping_max_performance_drops=0,
        reduce_lr_on_plateau=False,
    )
    # fallback path
    trainer = Trainer(TrainSettings(**base, load=str(tmp_path / "missing_ckpt")))
    assert trainer.params is not None
    # strict path
    with pytest.raises(FileNotFoundError):
        Trainer(
            TrainSettings(**base, load=str(tmp_path / "missing_ckpt"), continue_training=True)
        )


def test_parallel_predict_rgb_architecture():
    """RGB (pretrained-encoder) models get 3-channel expansion + their own
    preprocess in the parallel executor, same as the single path."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    import numpy as np

    from page_segmentation_tpu.inference.classifier import PixelClassifier
    from page_segmentation_tpu.models.registry import Architecture
    from page_segmentation_tpu.parallel.executor import ParallelPredictor
    from page_segmentation_tpu.parallel.mesh import make_mesh

    classifier = PixelClassifier(n_classes=3, architecture=Architecture.MOBILE_NET)
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (2, 64, 64)).astype(np.uint8)

    parallel = ParallelPredictor(classifier, make_mesh(2))
    pred = parallel.predict_batch(images)
    assert pred.shape == (2, 64, 64)

    # must equal the single-device forward
    single = []
    for img in images:
        from page_segmentation_tpu.data.dataset import SingleData

        _, _, p = classifier.predict_single_data(SingleData(image=img))
        single.append(p)
    np.testing.assert_array_equal(pred, np.stack(single))
