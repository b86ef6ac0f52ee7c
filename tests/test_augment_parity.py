"""Augmentation parity vs Keras apply_affine_transform semantics.

The reference's ImageDataGenerator triple boils down to
``apply_affine_transform(x, theta, tx, ty, shear, zx, zy, order, fill)``
per stream; our affine_matrix/apply_affine must produce the same pixels
for the same parameters (behavioral-parity target, SURVEY §7 hard part e).
"""
import numpy as np
import pytest

keras_image = pytest.importorskip("keras.src.legacy.preprocessing.image")

from page_segmentation_tpu.data.augment import (
    AffineParams,
    affine_matrix,
    apply_affine,
    augment_triple,
    sample_affine_params,
)


@pytest.mark.parametrize(
    "params",
    [
        AffineParams(theta=2.5),
        AffineParams(tx=3.0, ty=-2.0),
        AffineParams(zx=0.95, zy=1.05),
        AffineParams(shear=1.5),
        AffineParams(theta=-2.0, tx=1.5, ty=2.5, zx=1.03, zy=0.97),
    ],
)
@pytest.mark.parametrize("order", [0, 3])
def test_matches_keras_affine(params, order):
    rng = np.random.RandomState(0)
    img = (rng.rand(40, 30, 1) * 255).astype(np.float64)

    expected = keras_image.apply_affine_transform(
        img.copy(),
        theta=params.theta,
        tx=params.tx,
        ty=params.ty,
        shear=params.shear,
        zx=params.zx,
        zy=params.zy,
        row_axis=0,
        col_axis=1,
        channel_axis=2,
        fill_mode="nearest",
        cval=0.0,
        order=order,
    )
    got = apply_affine(img[..., 0], params, order=order, fill_mode="nearest")
    np.testing.assert_allclose(got, expected[..., 0], atol=1e-6)


def test_flips_and_brightness():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    flipped = apply_affine(img, AffineParams(flip_horizontal=True), order=0)
    np.testing.assert_array_equal(flipped, img[:, ::-1])
    flipped_v = apply_affine(img, AffineParams(flip_vertical=True), order=0)
    np.testing.assert_array_equal(flipped_v, img[::-1])
    bright = apply_affine(img, AffineParams(brightness=2.0), order=0)
    np.testing.assert_array_equal(bright, np.clip(img.astype(np.float64) * 2, 0, 255).astype(np.uint8))


def test_sampler_ranges():
    rng = np.random.default_rng(0)
    for _ in range(20):
        p = sample_affine_params(
            rng,
            (100, 80),
            rotation_range=2.5,
            width_shift_range=0.025,
            height_shift_range=0.025,
            zoom_range=(0.95, 1.05),
        )
        assert -2.5 <= p.theta <= 2.5
        assert abs(p.tx) <= 2.5  # 0.025 * 100
        assert abs(p.ty) <= 2.0  # 0.025 * 80
        assert 0.95 <= p.zx <= 1.05 and 0.95 <= p.zy <= 1.05


def test_augment_triple_shared_transform():
    """Image/binary/mask must move together (the reference's shared-seed
    contract, network.py:149-157)."""
    from page_segmentation_tpu.train.trainer import AugmentationSettings

    mask = np.zeros((60, 60), np.uint8)
    mask[20:40, 20:40] = 1
    image = mask * 200
    binary = mask.copy()
    params = AffineParams(theta=10.0, tx=4.0, zx=0.9, zy=0.9)
    image_out, binary_out, mask_out = augment_triple(
        image, binary, mask, params, AugmentationSettings()
    )
    # binary and mask use the same order-0 transform -> identical support
    np.testing.assert_array_equal(binary_out.astype(bool), mask_out.astype(bool))
    # image (order 3) overlaps the mask support strongly
    overlap = ((image_out > 100) & (mask_out == 1)).sum() / max((mask_out == 1).sum(), 1)
    assert overlap > 0.9
    assert set(np.unique(mask_out)) <= {0, 1}  # order-0 preserves labels
