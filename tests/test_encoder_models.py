"""Pretrained-encoder model families: shape/forward/train smoke tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from page_segmentation_tpu.models.registry import Architecture


@pytest.mark.parametrize(
    "arch",
    [Architecture.MOBILE_NET, Architecture.RES_NET, Architecture.EFFNETB0],
)
def test_encoder_model_forward(arch):
    module = arch.model(3)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    out = module.apply(variables, x)
    assert out.shape == (1, 64, 64, 3)
    assert out.dtype == jnp.float32


def test_effnet_variants_scale():
    b0 = Architecture.EFFNETB0.model(2)
    b2 = Architecture.EFFNETB2.model(2)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v0 = b0.init(jax.random.PRNGKey(0), x)
    v2 = b2.init(jax.random.PRNGKey(0), x)
    n0 = sum(p.size for p in jax.tree_util.tree_leaves(v0["params"]))
    n2 = sum(p.size for p in jax.tree_util.tree_leaves(v2["params"]))
    assert n2 > n0  # width/depth multipliers grow the model


def test_bn_model_trains(tmp_path):
    """BatchNorm batch_stats thread through the train step and checkpoint."""
    from page_segmentation_tpu.core.colors import ColorMap
    from page_segmentation_tpu.data.dataset import Dataset, SingleData
    from page_segmentation_tpu.train.metrics import Monitor
    from page_segmentation_tpu.train.trainer import Trainer, TrainSettings

    cmap = ColorMap({"(255, 255, 255)": (0, "bg"), "(255, 0, 0)": (1, "text")})
    rng = np.random.RandomState(0)
    pages = []
    for _ in range(2):
        mask = np.zeros((32, 32), np.uint8)
        mask[8:24, 8:24] = 1
        image = np.where(mask == 1, 200, 20).astype(np.uint8)
        pages.append(SingleData(image=image, binary=(mask == 1).astype(np.uint8), mask=mask))
    data = Dataset(pages, cmap)

    settings = TrainSettings(
        n_epoch=2,
        n_classes=2,
        l_rate=1e-3,
        train_data=data,
        validation_data=None,
        display=10,
        output_dir=str(tmp_path / "out"),
        threads=1,
        monitor=Monitor.LOSS,
        architecture=Architecture.MOBILE_NET,
        early_stopping_max_performance_drops=0,
        reduce_lr_on_plateau=False,
    )
    trainer = Trainer(settings)
    assert trainer.model_state  # batch_stats present
    history = trainer.train()
    assert np.isfinite(history["loss"]).all()

    # checkpoint carries batch_stats; classifier reloads them
    from page_segmentation_tpu.inference.classifier import PixelClassifier

    net = PixelClassifier(
        n_classes=2, architecture=Architecture.MOBILE_NET, model_path=str(tmp_path / "out" / "model")
    )
    assert "batch_stats" in net.variables
    _, _, pred = net.predict_single_data(data.data[0])
    assert pred.shape == (32, 32)
