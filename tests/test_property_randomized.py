"""Property-style randomized loops (hypothesis is not in the image) over
the resize / prepare / augment invariants at arbitrary shapes — the
guards behind the bucketing and normalization contracts (SURVEY §7 hard
part (a): bit-compatibility of the resize/rescale chains)."""
import numpy as np
import pytest

from page_segmentation_tpu.data.augment import (
    AffineParams,
    apply_affine,
    augment_triple,
    sample_affine_params,
)
from page_segmentation_tpu.data.prepare import prepare_images, prepare_mask
from page_segmentation_tpu.ops.resize import (
    output_shape_for_scale,
    resize_cubic,
    resize_nearest,
)


RNG = np.random.RandomState(1234)


def _random_shape(lo=3, hi=97):
    return int(RNG.randint(lo, hi)), int(RNG.randint(lo, hi))


class TestResizeProperties:
    def test_nearest_value_preserving_any_shape(self):
        """Nearest never invents values, at any in/out shape pair."""
        for _ in range(40):
            h, w = _random_shape()
            oh, ow = _random_shape(2, 120)
            img = RNG.randint(0, 255, (h, w)).astype(np.uint8)
            out = resize_nearest(img, (oh, ow))
            assert out.shape == (oh, ow)
            assert set(np.unique(out)) <= set(np.unique(img))

    def test_nearest_identity(self):
        for _ in range(10):
            h, w = _random_shape()
            img = RNG.randint(0, 255, (h, w)).astype(np.uint8)
            np.testing.assert_array_equal(resize_nearest(img, (h, w)), img)

    def test_cubic_constant_preserved(self):
        """Cubic resize of a constant image is that constant."""
        for _ in range(20):
            h, w = _random_shape()
            oh, ow = _random_shape(2, 120)
            value = float(RNG.randint(0, 255))
            img = np.full((h, w), value, np.float32)
            out = resize_cubic(img, (oh, ow))
            np.testing.assert_allclose(out, value, atol=1e-3)

    def test_cubic_range_sane(self):
        """Anti-aliased downscale stays within a small overshoot of the
        input range (cubic kernels ring by at most ~15%)."""
        for _ in range(20):
            h, w = _random_shape(16, 97)
            img = RNG.randint(0, 256, (h, w)).astype(np.float32)
            out = resize_cubic(img, (h // 2 + 1, w // 2 + 1), anti_aliasing=True)
            assert out.min() > -40 and out.max() < 296

    def test_output_shape_for_scale_matches_skimage_convention(self):
        for _ in range(40):
            h, w = _random_shape()
            scale = float(RNG.uniform(0.05, 3.0))
            oh, ow = output_shape_for_scale((h, w), scale)
            # skimage rescale convention: np.round(dim * scale)
            assert oh == int(np.round(h * scale))
            assert ow == int(np.round(w * scale))


class TestPrepareProperties:
    def test_prepare_images_contract_random_shapes(self):
        """prepare_images: inverted uint8, binary {0,1}, shapes agree, and
        the scale follows target/line_height at any page size."""
        for _ in range(15):
            h, w = _random_shape(24, 140)
            line_height = int(RNG.randint(4, 30))
            target = int(RNG.randint(3, 12))
            image = RNG.randint(0, 256, (h, w)).astype(np.uint8)
            binary = (RNG.rand(h, w) > 0.5).astype(np.uint8) * 255
            img_out, bin_out = prepare_images(image, binary, target, line_height)
            assert img_out.dtype == np.uint8
            assert img_out.shape == bin_out.shape
            expected = output_shape_for_scale((h, w), target / line_height)
            assert img_out.shape == expected
            assert set(np.unique(bin_out)) <= {0, 1}

    def test_prepare_mask_label_preserving(self):
        for _ in range(15):
            h, w = _random_shape(10, 80)
            mask = RNG.randint(0, 4, (h, w)).astype(np.int32)
            out = prepare_mask(mask, _random_shape(5, 60))
            assert set(np.unique(out)) <= set(np.unique(mask))


class TestAugmentProperties:
    def test_identity_params_are_identity(self):
        for _ in range(10):
            h, w = _random_shape(12, 60)
            image = RNG.randint(0, 256, (h, w)).astype(np.uint8)
            params = AffineParams(theta=0, tx=0, ty=0, shear=0, zx=1, zy=1,
                                  flip_horizontal=False, flip_vertical=False,
                                  brightness=None)
            out = apply_affine(image.astype(np.float32), params, order=0)
            np.testing.assert_array_equal(out.astype(np.uint8), image)

    def test_triple_shapes_and_mask_labels(self):
        """augment_triple keeps shapes and never invents mask labels."""

        class _Settings:
            image_fill_mode = "nearest"
            binary_fill_mode = "nearest"
            mask_fill_mode = "nearest"
            image_cval = 0.0
            binary_cval = 0.0
            mask_cval = 0.0
            brightness_range = None

        rng = np.random.RandomState(7)
        for _ in range(10):
            h, w = _random_shape(16, 70)
            image = RNG.randint(0, 256, (h, w)).astype(np.uint8)
            binary = (RNG.rand(h, w) > 0.5).astype(np.uint8)
            mask = RNG.randint(0, 3, (h, w)).astype(np.uint8)
            params = sample_affine_params(
                np.random.default_rng(rng.randint(1 << 31)), (h, w),
                rotation_range=5.0, width_shift_range=0.05, height_shift_range=0.05,
                shear_range=2.0, zoom_range=(0.9, 1.1),
                horizontal_flip=True, vertical_flip=False, brightness_range=None,
            )
            img_a, bin_a, mask_a = augment_triple(image, binary, mask, params, _Settings())
            assert img_a.shape == image.shape
            assert mask_a.shape == mask.shape
            assert set(np.unique(mask_a)) <= set(np.unique(mask))
            assert set(np.unique(bin_a)) <= set(np.unique(binary))
