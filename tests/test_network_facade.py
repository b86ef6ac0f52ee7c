"""Network facade: the reference runtime API surface end to end."""
import numpy as np
import pytest

from page_segmentation_tpu.core.colors import ColorMap
from page_segmentation_tpu.data.dataset import Dataset, SingleData
from page_segmentation_tpu.models.registry import Architecture
from page_segmentation_tpu.network import Network, tf_backend_allow_growth
from page_segmentation_tpu.train.metrics import Monitor
from page_segmentation_tpu.train.trainer import TrainSettings


@pytest.fixture
def dataset():
    cmap = ColorMap({"(255, 255, 255)": (0, "bg"), "(255, 0, 0)": (1, "text")})
    rng = np.random.RandomState(0)
    pages = []
    for _ in range(3):
        mask = np.zeros((32, 32), np.uint8)
        mask[8:24, 8:24] = 1
        image = np.where(mask == 1, 200, 10).astype(np.uint8)
        image = np.clip(image + rng.randint(-5, 5, image.shape), 0, 255).astype(np.uint8)
        pages.append(SingleData(image=image, binary=mask, mask=mask))
    return Dataset(pages, cmap)


def test_generator_contract(dataset):
    """create_dataset_inputs yields the reference's dict structure
    (network.py:127-165): ({'input_1', 'input_2'}, {'logits'}) batch-of-1."""
    net = Network("train", n_classes=2)
    gen = net.create_dataset_inputs(dataset, data_augmentation=False)
    inputs, targets = next(gen)
    assert set(inputs) == {"input_1", "input_2"}
    assert inputs["input_1"].shape == (1, 32, 32, 1)
    assert inputs["input_2"].shape == (1, 32, 32, 1)
    assert targets["logits"].shape == (1, 32, 32, 1)
    # preprocess applied (÷255)
    assert inputs["input_1"].max() <= 1.0
    # generator cycles past the dataset length
    for _ in range(4):
        next(gen)


def test_generator_augmentation_and_foreground_masks(dataset):
    net = Network("train", n_classes=2, foreground_masks=True)
    gen = net.create_dataset_inputs(dataset, data_augmentation=True)
    inputs, targets = next(gen)
    assert inputs["input_1"].shape[0] == 1
    mask = targets["logits"][0, :, :, 0]
    binary = inputs["input_2"][0, :, :, 0]
    # foreground masking: labels only where binary == 1
    assert (mask[binary != 1] == 0).all()


def test_train_and_evaluate_and_predict(dataset, tmp_path):
    net = Network("train", n_classes=2)
    settings = TrainSettings(
        n_epoch=3,
        n_classes=2,
        l_rate=2e-3,
        train_data=dataset,
        validation_data=None,
        display=1,
        output_dir=str(tmp_path / "out"),
        threads=1,
        monitor=Monitor.LOSS,
        early_stopping_max_performance_drops=0,
        reduce_lr_on_plateau=False,
    )
    history = net.train_dataset(settings)
    assert history["loss"][-1] < history["loss"][0]

    metrics = net.evaluate_dataset(dataset)
    assert metrics["accuracy"] > 0.8

    logit, prob, pred = net.predict_single_data(dataset.data[0])
    assert pred.shape == (32, 32)
    assert abs(prob.sum(-1) - 1).max() < 1e-5


def test_predict_network_from_checkpoint(dataset, tmp_path):
    from page_segmentation_tpu.train.checkpoint import save_checkpoint

    net = Network("train", n_classes=2)
    save_checkpoint(str(tmp_path / "ckpt"), net.classifier.variables,
                    meta={"architecture": "fcn_skip"})
    loaded = Network("Predict", n_classes=2, model=str(tmp_path / "ckpt"))
    assert loaded.architecture == Architecture.FCN_SKIP.value
    _, _, pred_a = net.predict_single_data(dataset.data[0])
    _, _, pred_b = loaded.predict_single_data(dataset.data[0])
    np.testing.assert_array_equal(pred_a, pred_b)


def test_allow_growth_noop():
    tf_backend_allow_growth()  # parity no-op must not raise
