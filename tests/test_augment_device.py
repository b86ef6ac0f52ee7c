"""On-device augmentation: geometry sanity + trainer integration."""
import numpy as np
import jax
import pytest

from page_segmentation_tpu.data.augment_device import (
    DeviceAugmentConfig,
    augment_batch_on_device,
)


def test_identity_config_is_noop():
    cfg = DeviceAugmentConfig(
        rotation_range=0, width_shift_range=0, height_shift_range=0,
        shear_range=0, zoom_min=1.0, zoom_max=1.0,
    )
    rng = np.random.RandomState(0)
    images = rng.rand(2, 32, 32, 1).astype(np.float32)
    binaries = (rng.rand(2, 32, 32) > 0.5).astype(np.uint8)
    masks = rng.randint(0, 3, (2, 32, 32)).astype(np.int32)
    img, b, m = augment_batch_on_device(jax.random.PRNGKey(0), images, binaries, masks, cfg)
    np.testing.assert_allclose(np.asarray(img), images, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(b), binaries)
    np.testing.assert_array_equal(np.asarray(m), masks)


def test_shared_transform_across_triple():
    cfg = DeviceAugmentConfig(rotation_range=10.0, width_shift_range=0.1, height_shift_range=0.1)
    mask = np.zeros((1, 48, 48), np.int32)
    mask[:, 16:32, 16:32] = 1
    binary = mask.astype(np.uint8)
    image = (mask * 200).astype(np.float32)[..., None]
    img, b, m = augment_batch_on_device(jax.random.PRNGKey(3), image, binary, mask, cfg)
    img, b, m = np.asarray(img), np.asarray(b), np.asarray(m)
    # nearest warps of identical inputs stay identical
    np.testing.assert_array_equal(b.astype(bool), m.astype(bool))
    # transform actually moved things
    assert (m != mask).any()
    # bilinear image support overlaps the mask support
    overlap = ((img[..., 0] > 100) & (m == 1)).sum() / max((m == 1).sum(), 1)
    assert overlap > 0.85
    # labels preserved under order-0
    assert set(np.unique(m)) <= {0, 1}


def test_pure_shift_matches_host():
    """A pure integer shift must displace pixels exactly like the host path."""
    from page_segmentation_tpu.data.augment import AffineParams, apply_affine

    cfg = DeviceAugmentConfig(
        rotation_range=0, width_shift_range=0, height_shift_range=0.5,
        shear_range=0, zoom_min=1.0, zoom_max=1.0,
    )
    rng = np.random.RandomState(1)
    image = rng.randint(0, 255, (1, 16, 16), np.uint8).astype(np.int32)
    out = augment_batch_on_device(
        jax.random.PRNGKey(0),
        image[..., None].astype(np.float32),
        image.astype(np.uint8),
        image,
        cfg,
    )
    m = np.asarray(out[2])[0]
    # oracle: find the tx the device used by matching against host shifts
    matches = []
    for tx in range(-8, 9):
        host = apply_affine(image[0], AffineParams(tx=tx), order=0)
        if (host == m).all():
            matches.append(tx)
    assert matches, "device shift must equal some integer host shift"


def test_trainer_device_augmentation(tmp_path):
    from page_segmentation_tpu.core.colors import ColorMap
    from page_segmentation_tpu.data.dataset import Dataset, SingleData
    from page_segmentation_tpu.train.metrics import Monitor
    from page_segmentation_tpu.train.trainer import Trainer, TrainSettings

    cmap = ColorMap({"(255, 255, 255)": (0, "bg"), "(255, 0, 0)": (1, "t")})
    rng = np.random.RandomState(0)
    pages = []
    for _ in range(2):
        mask = np.zeros((32, 32), np.uint8)
        mask[8:24, 8:24] = 1
        image = np.where(mask == 1, 200, 10).astype(np.uint8)
        pages.append(SingleData(image=image, binary=mask, mask=mask))
    settings = TrainSettings(
        n_epoch=2, n_classes=2, l_rate=1e-3,
        train_data=Dataset(pages, cmap), validation_data=None,
        display=1, output_dir=str(tmp_path / "o"), threads=1,
        monitor=Monitor.LOSS, early_stopping_max_performance_drops=0,
        reduce_lr_on_plateau=False,
        data_augmentation=True, device_augmentation=True,
    )
    history = Trainer(settings).train()
    assert np.isfinite(history["loss"]).all()
