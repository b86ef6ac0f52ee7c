"""ImageNet-encoder provisioning flow (tools/provision_pretrained.py):
validate + convert a keras-applications backbone .h5, then fine-tune
from the converted native checkpoint — the zero-egress counterpart of
the reference's ``weights='imagenet'`` (reference model.py:101,327,377).
"""
import json

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.provision_pretrained import main as provision

HW = 96


@pytest.fixture(scope="module")
def backbone_h5(tmp_path_factory):
    tf.keras.utils.set_random_seed(13)
    path = tmp_path_factory.mktemp("bb") / "mobilenetv2.h5"
    tf.keras.applications.MobileNetV2(
        weights=None, include_top=False, input_shape=(HW, HW, 3)).save(str(path))
    return path


def test_provision_detects_and_converts(backbone_h5, tmp_path, capsys):
    out = tmp_path / "encoder_ckpt"
    rc = provision([str(backbone_h5), "--out", str(out)])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["family"] == "mobilenet"
    assert report["variant"] == "mobilenetv2"
    assert report["tensors"] > 200
    assert len(report["sha256"]) == 64
    assert (out / "params.msgpack").exists()
    meta = json.loads((out / "meta.json").read_text())
    assert meta["source_sha256"] == report["sha256"]


def test_provision_detects_effnet_variant(tmp_path, capsys):
    tf.keras.utils.set_random_seed(13)
    path = tmp_path / "effb0.h5"
    tf.keras.applications.EfficientNetB0(
        weights=None, include_top=False, input_shape=(HW, HW, 3)).save(str(path))
    rc = provision([str(path)])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["family"] == "effnet"
    assert report["variant"] == "effb0"


def test_finetune_from_converted_checkpoint(backbone_h5, tmp_path, capsys):
    """train --pretrained_encoder <converted dir>: the encoder starts from
    the provisioned weights (== direct .h5 import), one epoch runs."""
    from page_segmentation_tpu.core.colors import ColorMap
    from page_segmentation_tpu.data.dataset import Dataset, SingleData
    from page_segmentation_tpu.models.mobilenet_import import load_mobilenet_encoder_h5
    from page_segmentation_tpu.models.registry import Architecture
    from page_segmentation_tpu.train.metrics import Monitor
    from page_segmentation_tpu.train.trainer import Trainer, TrainSettings

    out = tmp_path / "encoder_ckpt"
    provision([str(backbone_h5), "--out", str(out)])
    capsys.readouterr()

    cmap = ColorMap({"(255, 255, 255)": (0, "background"), "(255, 0, 0)": (1, "text")})
    rng = np.random.RandomState(0)
    pages = []
    for _ in range(2):
        mask = np.zeros((HW, HW), np.uint8)
        mask[20:70, 20:70] = 1
        image = np.where(mask == 1, 200, 30).astype(np.uint8)
        pages.append(SingleData(image=image, binary=(mask == 1).astype(np.uint8), mask=mask))
    data = Dataset(pages, cmap)

    trainer = Trainer(TrainSettings(
        n_epoch=1, n_classes=2, l_rate=1e-4, train_data=data,
        validation_data=None, output_dir=str(tmp_path / "o"), display=10,
        threads=1, architecture=Architecture.MOBILE_NET, monitor=Monitor.LOSS,
        early_stopping_max_performance_drops=0, reduce_lr_on_plateau=False,
        pretrained_encoder=str(out),
    ))
    enc_params, _ = load_mobilenet_encoder_h5(str(backbone_h5))
    np.testing.assert_allclose(
        np.asarray(trainer.params["encoder"]["stem"]["conv"]["kernel"]),
        enc_params["stem"]["conv"]["kernel"], atol=1e-6)
    history = trainer.train()
    assert np.isfinite(history["loss"][0])


def test_family_mismatch_rejected(backbone_h5, tmp_path, capsys):
    from page_segmentation_tpu.models.h5_import import load_encoder_into
    from page_segmentation_tpu.models.registry import Architecture

    out = tmp_path / "enc"
    provision([str(backbone_h5), "--out", str(out)])
    capsys.readouterr()
    with pytest.raises(ValueError, match="mobilenet backbone"):
        load_encoder_into({"params": {}}, Architecture.RES_NET, str(out))
