import numpy as np
import jax.numpy as jnp
import pytest

from page_segmentation_tpu.train import metrics as M


@pytest.fixture
def batch():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 8, 8, 3).astype(np.float32)
    labels = rng.randint(0, 3, (2, 8, 8)).astype(np.int32)
    return labels, logits


def _np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_loss_matches_numpy(batch):
    labels, logits = batch
    probs = _np_softmax(logits)
    expected = -np.mean(np.log(np.take_along_axis(probs, labels[..., None], -1)))
    np.testing.assert_allclose(float(M.loss(labels, logits)), expected, rtol=1e-5)


def test_accuracy(batch):
    labels, logits = batch
    expected = np.mean(labels == logits.argmax(-1))
    np.testing.assert_allclose(float(M.accuracy(labels, logits)), expected, rtol=1e-6)


def test_accuracy_with_channel_dim(batch):
    labels, logits = batch
    a = float(M.accuracy(labels[..., None], logits))
    b = float(M.accuracy(labels, logits))
    assert a == b


def test_jaccard_dice_formulas(batch):
    labels, logits = batch
    probs = _np_softmax(logits)
    one_hot = np.eye(3)[labels]
    inter = np.abs(one_hot * probs).sum((1, 2))
    total = np.abs(one_hot + probs).sum((1, 2))
    jac = ((inter + 100) / (total - inter + 100)).mean(0)
    dice = ((2 * inter + 100) / (total + 100)).mean(0)
    np.testing.assert_allclose(np.asarray(M.jacard_coef(labels, logits)), jac, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(M.dice_coef(labels, logits)), dice, rtol=1e-5)
    np.testing.assert_allclose(float(M.jacard_coef_loss(labels, logits)), np.mean(-np.log(jac)), rtol=1e-5)
    np.testing.assert_allclose(float(M.dice_coef_loss(labels, logits)), np.mean(-np.log(dice)), rtol=1e-5)


def test_perfect_prediction_metrics():
    labels = np.zeros((1, 4, 4), np.int32)
    logits = np.zeros((1, 4, 4, 2), np.float32)
    logits[..., 0] = 100.0
    assert float(M.accuracy(labels, logits)) == 1.0
    assert float(M.loss(labels, logits)) < 1e-6


def test_fgpa(batch):
    labels, logits = batch
    binary = np.zeros((2, 8, 8), np.uint8)
    binary[:, :4] = 1
    pred = logits.argmax(-1)
    per_img = ((labels == pred) * binary).sum((1, 2)) / binary.sum((1, 2))
    np.testing.assert_allclose(float(M.fgpa(labels, logits, binary)), per_img.mean(), rtol=1e-5)


def test_categorical_hinge(batch):
    labels, logits = batch
    one_hot = np.eye(3)[labels]
    pos = (one_hot * logits).sum(-1)
    neg = ((1 - one_hot) * logits).max(-1)
    expected = np.mean(np.maximum(0.0, neg - pos + 1))
    np.testing.assert_allclose(float(M.categorical_hinge(labels, logits)), expected, rtol=1e-5)


def test_loss_enum_dispatch(batch):
    labels, logits = batch
    fn = M.Loss.CATEGORICAL_CROSSENTROPY()
    assert fn is M.loss
    for loss_enum in M.Loss:
        val = float(loss_enum()(labels, logits))
        assert np.isfinite(val)


def test_monitor_mode():
    assert M.Monitor.VAL_LOSS.mode == "min"
    assert M.Monitor.VAL_ACCURACY.mode == "max"
    assert M.Monitor.VAL_LOSS.is_validation
    assert not M.Monitor.LOSS.is_validation


def test_focal_loss_padding_invariant():
    """Padding a batch (with weights marking valid pixels) must not change
    the focal loss — a plain mean would shrink with the padding fraction."""
    import numpy as np

    from page_segmentation_tpu.train import metrics as M

    rng = np.random.RandomState(0)
    labels = rng.randint(0, 3, (2, 8, 10)).astype(np.int32)
    logits = rng.randn(2, 8, 10, 3).astype(np.float32)
    base = float(M.categorical_focal_loss(labels, logits))

    padded_labels = np.zeros((2, 16, 12), np.int32)
    padded_logits = np.zeros((2, 16, 12, 3), np.float32)
    weights = np.zeros((2, 16, 12), np.float32)
    padded_labels[:, :8, :10] = labels
    padded_logits[:, :8, :10] = logits
    weights[:, :8, :10] = 1.0
    padded = float(M.categorical_focal_loss(padded_labels, padded_logits, weights=weights))
    np.testing.assert_allclose(padded, base, rtol=1e-5)
