"""Space-to-depth stem rewrite (models/s2d.py): exactness gates.

The s2d factor-4 stem reindexes the two full-resolution 5x5 convs of
fcn/fcn_skip (reference model.py:45-92) onto a 4x-smaller grid with 16x
the channels — same parameters, same 25 multiply-adds per output — so
the flag must be output-equivalent to the dense path up to float
accumulation order.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from page_segmentation_tpu.models.fcn import FCN, FCNSkip
from page_segmentation_tpu.models.s2d import (
    depth_to_space,
    s2d_bias,
    s2d_conv_kernel,
    space_to_depth,
    stem_applicable,
)


def _dense_conv(x, kernel, bias):
    from jax import lax

    y = lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias


def test_space_to_depth_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x, 4), 4), x)


@pytest.mark.parametrize("cin,cout", [(1, 20), (20, 30), (3, 7)])
def test_s2d_conv_equals_dense(cin, cout):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 24, 32, cin).astype(np.float32))
    kernel = jnp.asarray(rng.randn(5, 5, cin, cout).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))

    dense = _dense_conv(x, kernel, bias)
    packed = _dense_conv(space_to_depth(x, 4), s2d_conv_kernel(kernel, 4),
                         s2d_bias(bias, 4))
    np.testing.assert_allclose(
        np.asarray(depth_to_space(packed, 4)), np.asarray(dense),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("module_cls", [FCNSkip, FCN])
def test_s2d_stem_model_equivalence(module_cls):
    """Same params through both stems: equal argmax, close logits."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 48, 64, 1).astype(np.float32))

    dense_model = module_cls(n_classes=3)
    params = dense_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))["params"]
    fast_model = module_cls(n_classes=3, s2d_stem=True)

    dense = np.asarray(dense_model.apply({"params": params}, x))
    fast = np.asarray(fast_model.apply({"params": params}, x))
    assert dense.shape == fast.shape
    np.testing.assert_allclose(fast, dense, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(fast.argmax(-1), dense.argmax(-1))


def test_s2d_stem_param_tree_identical():
    """The flag changes no parameter names, shapes, or init draws —
    checkpoints are interchangeable."""
    dense = FCNSkip(n_classes=3).init(jax.random.PRNGKey(4), jnp.zeros((1, 16, 16, 1)))
    fast = FCNSkip(n_classes=3, s2d_stem=True).init(jax.random.PRNGKey(4), jnp.zeros((1, 16, 16, 1)))
    flat_d = jax.tree_util.tree_leaves_with_path(dense)
    flat_f = jax.tree_util.tree_leaves_with_path(fast)
    assert [p for p, _ in flat_d] == [p for p, _ in flat_f]
    for (_, a), (_, b) in zip(flat_d, flat_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_s2d_stem_odd_shape_falls_back():
    """H/W not divisible by 4: the stem runs the dense path bit-for-bit.

    (The full fcn/fcn_skip models require multiples of 8 anyway — the
    bucketing batcher guarantees it — so within the supported envelope
    the rewrite always applies; this pins the guard itself.)"""
    from flax import linen as nn

    from page_segmentation_tpu.models.fcn import _stem

    assert not stem_applicable((1, 37, 53, 1))
    assert stem_applicable((1, 40, 56, 1))

    class Stem(nn.Module):
        s2d: bool

        @nn.compact
        def __call__(self, x):
            return _stem(x, 4, 6, jnp.float32, self.s2d)

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 37, 53, 1).astype(np.float32))
    params = Stem(s2d=False).init(jax.random.PRNGKey(0), x)["params"]
    dense = np.asarray(Stem(s2d=False).apply({"params": params}, x))
    fast = np.asarray(Stem(s2d=True).apply({"params": params}, x))
    np.testing.assert_array_equal(fast, dense)


def test_s2d_stem_through_classifier():
    """PixelClassifier(s2d_stem=True) predicts identically (argmax) to the
    dense path for the same parameters, through the bucketed jit cache."""
    from page_segmentation_tpu.inference.classifier import PixelClassifier

    dense = PixelClassifier(n_classes=3, seed=1)
    fast = PixelClassifier(n_classes=3, seed=1, s2d_stem=True)
    fast.variables = dense.variables  # identical trees by construction

    rng = np.random.RandomState(7)
    from page_segmentation_tpu.data.dataset import SingleData

    data = SingleData(
        image=rng.randint(0, 256, (41, 59)).astype(np.uint8),
        binary=np.ones((41, 59), np.uint8),
    )
    logit_d, _, pred_d = dense.predict_single_data(data)
    logit_f, _, pred_f = fast.predict_single_data(data)
    np.testing.assert_array_equal(np.asarray(pred_f), np.asarray(pred_d))
    np.testing.assert_allclose(np.asarray(logit_f), np.asarray(logit_d),
                               rtol=1e-4, atol=1e-4)


def test_s2d_stem_gradients_match_dense():
    """Differentiable: the rewrite's gradients flow back to the original
    (5,5,cin,cout) parameters and match the dense stem's."""
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, 3, (1, 32, 32)))

    params = FCNSkip(n_classes=3).init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))["params"]

    def loss(p, model):
        logits = model.apply({"params": p}, x)
        onehot = jax.nn.one_hot(mask, 3)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1))

    g_dense = jax.grad(loss)(params, FCNSkip(n_classes=3))
    g_fast = jax.grad(loss)(params, FCNSkip(n_classes=3, s2d_stem=True))
    for path, a in jax.tree_util.tree_leaves_with_path(g_dense):
        b = g_fast
        for key in path:
            b = b[key.key]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5,
                                   err_msg=str(path))
