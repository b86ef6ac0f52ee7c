"""Legacy TF1 checkpoint migration (models/tf1_import.py).

The reference triggers a (missing) migration script when a TF1 ``.meta``
sits next to the requested ``.h5`` (network.py:60-68); here the
migration is native and by-order.  The oracle is a real TF1 checkpoint:
``tf.compat.v1`` variables created in the fcn_skip conv plan's order,
saved with ``Saver`` (writes .meta + data), then migrated and compared
value-for-value, and loaded end-to-end through ``PixelClassifier``.

TF is required (it is the parity-oracle dependency of this test suite).
"""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from page_segmentation_tpu.models.registry import Architecture

# the reference fcn_skip conv plan (model.py:45-92): (name, kh, kw, cin, cout)
FCN_SKIP_PLAN = [
    ("conv1", 5, 5, 1, 20), ("conv2", 5, 5, 20, 30),
    ("conv3", 5, 5, 30, 40), ("conv4", 5, 5, 40, 40),
    ("conv5", 5, 5, 40, 60), ("conv6", 5, 5, 60, 60),
    ("conv7", 5, 5, 60, 80),
    ("deconv1", 5, 5, 80, 80),           # stride-1 transpose: (kh,kw,out,in)
    ("deconv2", 2, 2, 80, 60),
    ("deconv3", 5, 5, 120, 40),
    ("deconv4", 2, 2, 100, 30),
    ("deconv5", 2, 2, 70, 20),
    ("logits", 1, 1, 50, 3),
]


def _write_tf1_checkpoint(prefix: str, seed: int = 3):
    """A TF1-era-style checkpoint: get_variable per layer in plan order
    (kernel then bias), Saver writes .meta + data.  Kernel layouts match
    what the by-order consumers expect: conv (kh,kw,in,out), transpose
    conv (kh,kw,out,in) — the TF1 conv2d_transpose convention."""
    import jax
    import jax.numpy as jnp

    # target shapes straight from a fresh init so the synthetic graph is
    # exactly reference-shaped (incl. transpose kernel orientation)
    module = Architecture.FCN_SKIP.model(3)
    init = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))["params"]

    tf1 = tf.compat.v1
    rng = np.random.RandomState(seed)
    written = {}
    graph = tf1.Graph()
    with graph.as_default():
        for name, *_ in [(n,) for n, *_ in FCN_SKIP_PLAN]:
            kshape = tuple(np.asarray(init[name]["kernel"]).shape)
            bshape = tuple(np.asarray(init[name]["bias"]).shape)
            kval = rng.randn(*kshape).astype(np.float32) * 0.1
            bval = rng.randn(*bshape).astype(np.float32) * 0.1
            tf1.get_variable(f"{name}/kernel", initializer=kval)
            tf1.get_variable(f"{name}/bias", initializer=bval)
            written[name] = (kval, bval)
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, prefix)
    return written


def test_tf1_migration_values_and_order(tmp_path):
    from page_segmentation_tpu.models.tf1_import import load_tf1_checkpoint

    prefix = str(tmp_path / "legacy" / "model")
    written = _write_tf1_checkpoint(prefix)
    params = load_tf1_checkpoint(prefix + ".meta", Architecture.FCN_SKIP, 3)
    assert set(params) == set(written)
    for name, (kval, bval) in written.items():
        np.testing.assert_array_equal(params[name]["kernel"], kval)
        np.testing.assert_array_equal(params[name]["bias"], bval)


def test_tf1_migration_through_classifier(tmp_path):
    """The reference's trigger: loading model.h5 with only model.meta on
    disk migrates and predicts (network.py:60-68)."""
    from page_segmentation_tpu.data.dataset import SingleData
    from page_segmentation_tpu.inference.classifier import PixelClassifier

    prefix = str(tmp_path / "legacy" / "model")
    _write_tf1_checkpoint(prefix)
    net = PixelClassifier(n_classes=3, model_path=prefix + ".h5")
    page = SingleData(
        image=np.random.RandomState(0).randint(0, 255, (64, 48)).astype(np.uint8),
        binary=np.ones((64, 48), np.uint8),
    )
    _, prob, pred = net.predict_single_data(page)
    assert pred.shape == (64, 48)
    assert prob.shape[-1] == 3


def test_tf1_migration_rejects_wrong_plan(tmp_path):
    """A checkpoint whose conv shapes do not match the target architecture
    is refused, not silently mis-mapped."""
    from page_segmentation_tpu.models.tf1_import import load_tf1_checkpoint

    tf1 = tf.compat.v1
    prefix = str(tmp_path / "other" / "model")
    graph = tf1.Graph()
    with graph.as_default():
        tf1.get_variable("a/kernel", shape=(3, 3, 1, 8))
        tf1.get_variable("a/bias", shape=(8,))
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, prefix)
    with pytest.raises(ValueError, match="conv layers|kernel is"):
        load_tf1_checkpoint(prefix + ".meta", Architecture.FCN_SKIP, 3)
