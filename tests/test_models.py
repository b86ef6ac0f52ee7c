import numpy as np
import jax
import jax.numpy as jnp
import pytest

from page_segmentation_tpu.models.fcn import FCN, FCNSkip
from page_segmentation_tpu.models.registry import Architecture


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def _init_and_apply(module, rng, shape=(1, 32, 32, 1)):
    x = jnp.zeros(shape, jnp.float32)
    params = module.init(rng, x)["params"]
    return params, module.apply({"params": params}, x)


def test_fcn_skip_output_shape(rng):
    module = FCNSkip(n_classes=3)
    params, out = _init_and_apply(module, rng, (2, 32, 48, 1))
    assert out.shape == (2, 32, 48, 3)
    assert out.dtype == jnp.float32


def test_fcn_skip_param_structure(rng):
    module = FCNSkip(n_classes=3)
    params, _ = _init_and_apply(module, rng)
    names = set(params.keys())
    assert names == {
        "conv1", "conv2", "conv3", "conv4", "conv5", "conv6", "conv7",
        "deconv1", "deconv2", "deconv3", "deconv4", "deconv5", "logits",
    }
    assert params["conv1"]["kernel"].shape == (5, 5, 1, 20)
    # Keras layout for transpose kernels: (kh, kw, out, in)
    assert params["deconv2"]["kernel"].shape == (2, 2, 60, 80)
    assert params["logits"]["kernel"].shape == (1, 1, 50, 3)


def test_fcn_output_shape(rng):
    module = FCN(n_classes=2)
    _, out = _init_and_apply(module, rng, (1, 64, 32, 1))
    assert out.shape == (1, 64, 32, 2)


def test_unet_shapes(rng):
    module = Architecture.UNET.model(4)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    params = module.init(rng, x)["params"]
    out = module.apply({"params": params}, x)
    assert out.shape == (1, 32, 32, 4)


def test_res_unet_shapes(rng):
    module = Architecture.RES_UNET.model(3)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    params = module.init(rng, x)["params"]
    out = module.apply({"params": params}, x)
    assert out.shape == (1, 32, 32, 3)


def test_conv_transpose_matches_torch_gradient_of_conv():
    """TFConvTranspose must equal tf.keras Conv2DTranspose(padding='same').

    Oracle: torch conv_transpose2d (gradient-of-conv) with TF SAME cropping.
    """
    import torch
    from flax import linen as nn
    from page_segmentation_tpu.models.layers import TFConvTranspose

    rng_np = np.random.RandomState(0)
    for k, s in [(2, 2), (5, 1), (3, 2)]:
        x = rng_np.randn(1, 8, 8, 3).astype(np.float32)
        module = TFConvTranspose(4, (k, k), strides=(s, s), use_bias=False)
        params = module.init(jax.random.PRNGKey(0), jnp.array(x))["params"]
        w = np.asarray(params["kernel"])  # (k, k, out, in)

        wt = torch.tensor(np.transpose(w, (3, 2, 0, 1)))
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        full = torch.nn.functional.conv_transpose2d(xt, wt, stride=s, padding=0)
        pb = max(k - s, 0) // 2
        expected = np.transpose(full.numpy(), (0, 2, 3, 1))[:, pb : pb + 8 * s, pb : pb + 8 * s]

        got = np.asarray(module.apply({"params": params}, jnp.array(x)))
        np.testing.assert_allclose(got, expected, atol=1e-4)


def test_max_pool_same_odd_size():
    from page_segmentation_tpu.models.layers import max_pool_same

    x = jnp.arange(25, dtype=jnp.float32).reshape(1, 5, 5, 1)
    out = max_pool_same(x)
    assert out.shape == (1, 3, 3, 1)
    assert float(out[0, 2, 2, 0]) == 24.0


def test_upsample2x():
    from page_segmentation_tpu.models.layers import upsample2x

    x = jnp.array([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
    out = np.asarray(upsample2x(x))[0, :, :, 0]
    np.testing.assert_array_equal(out, [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]])


def test_architecture_registry_preprocess():
    fn, rgb = Architecture.FCN_SKIP.preprocess()
    assert not rgb
    np.testing.assert_allclose(fn(np.array([255.0])), [1.0])
    fn, rgb = Architecture.MOBILE_NET.preprocess()
    assert rgb
    np.testing.assert_allclose(fn(np.array([255.0])), [1.0])


def test_stride_factors():
    assert Architecture.FCN_SKIP.stride_factor == 8
    assert Architecture.UNET.stride_factor == 16
    assert Architecture.MOBILE_NET.stride_factor == 32


def test_host_device_preprocess_agree_all_modes():
    """The host (numpy) and device (jnp) normalizations come from one mode
    table and must agree bit-for-bit — compact uint8 transfers rely on it."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    gray = rng.randint(0, 256, (4, 6, 1)).astype(np.float32)
    rgb = rng.randint(0, 256, (4, 6, 3)).astype(np.float32)
    for arch in (Architecture.FCN_SKIP, Architecture.RES_NET,
                 Architecture.MOBILE_NET, Architecture.EFFNETB0):
        x = gray if arch is Architecture.FCN_SKIP else rgb
        host = np.asarray(arch.preprocess()[0](x), np.float32)
        dev = np.asarray(arch.device_preprocess()(jnp.asarray(x)), np.float32)
        np.testing.assert_allclose(host, dev, atol=1e-6, err_msg=arch.value)
