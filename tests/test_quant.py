"""int8 post-training quantization (models/quant.py).

Gates:
  * the 'float'-mode twin is BITWISE equal to models/fcn.py — pins the
    mirrored graph topology to the source of truth;
  * on an exact integer grid (inputs/weights already representable in
    int8 at scale 1) the int8 path equals the float path exactly — pins
    the quantize/conv/dequantize arithmetic;
  * on random data the int8 logits stay within a small fraction of the
    float logit range (random-init logits are near-tied, so argmax
    agreement is the weak gate here; logit error is the strong one);
  * the fast predict pipeline and PixelClassifier accept int8=True and
    agree with their float runs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from page_segmentation_tpu.models.fcn import FCN, FCNSkip
from page_segmentation_tpu.models.quant import (
    QConv,
    QuantFCN,
    QuantFCNSkip,
    calibrate,
    quantize_for_inference,
    twin_classes_for,
)


def _params(module, shape=(1, 32, 32, 1)):
    return module.init(jax.random.PRNGKey(0), jnp.zeros(shape))["params"]


# ------------------------------------------------------------ QConv unit
@pytest.mark.parametrize("transpose", [False, True])
def test_qconv_exact_on_integer_grid(transpose):
    """Integer inputs/weights with amax 127 quantize losslessly (scale 1),
    so int8 conv == float conv exactly — including the transpose path."""
    rng = np.random.RandomState(0)
    x = rng.randint(-127, 128, (2, 8, 8, 3)).astype(np.float32)
    x.flat[0] = 127.0  # pin the activation amax to exactly 127
    kshape = (2, 2, 4, 3) if transpose else (2, 2, 3, 4)
    kernel = rng.randint(-127, 128, kshape).astype(np.float32)
    # pin per-output-channel weight amax to exactly 127
    if transpose:
        kernel[0, 0, :, 0] = 127.0
    else:
        kernel[0, 0, 0, :] = 127.0
    bias = rng.randn(4).astype(np.float32)
    variables = {
        "params": {"kernel": kernel, "bias": bias},
        "amax": {"in": np.float32(127.0)},
    }
    strides = (2, 2) if transpose else (1, 1)
    q = QConv(4, (2, 2), strides=strides, transpose=transpose, mode="int8")
    f = QConv(4, (2, 2), strides=strides, transpose=transpose, mode="float")
    out_q = q.apply(variables, x)
    out_f = f.apply({"params": variables["params"]}, x)
    np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out_f))


def test_calibrate_running_max():
    """amax accumulates the max over batches, not the last batch."""
    cal = QConv(2, (3, 3), mode="calibrate")
    params = cal.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 1)))["params"]
    big = np.full((1, 4, 4, 1), 5.0, np.float32)
    small = np.full((1, 4, 4, 1), 2.0, np.float32)
    amax = {}
    for batch in (big, small):
        variables = {"params": params}
        if amax:
            variables["amax"] = amax
        _, mut = cal.apply(variables, batch, mutable=["amax"])
        amax = jax.device_get(mut["amax"])
    assert float(amax["in"]) == 5.0


# -------------------------------------------------------------- FCN twins
@pytest.mark.parametrize("float_cls,quant_cls", [(FCNSkip, QuantFCNSkip), (FCN, QuantFCN)])
def test_float_twin_bitwise(float_cls, quant_cls):
    m = float_cls(n_classes=3)
    params = _params(m)
    x = np.random.RandomState(1).rand(1, 48, 40, 1).astype(np.float32)
    ref = m.apply({"params": params}, x)
    out = quant_cls(n_classes=3, mode="float").apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_int8_logit_error_bounded():
    m = FCNSkip(n_classes=3)
    params = _params(m)
    x = np.random.RandomState(2).rand(2, 48, 40, 1).astype(np.float32)
    ref = np.asarray(m.apply({"params": params}, x))
    q, variables = quantize_for_inference("fcn_skip", 3, params, [x])
    out = np.asarray(q.apply(variables, x))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() <= 0.05 * scale
    agree = (out.argmax(-1) == ref.argmax(-1)).mean()
    # random-init logits are near-tied; trained models agree far higher
    assert agree >= 0.9


def test_quantize_rejects_unknown_architecture():
    with pytest.raises(ValueError, match="fcn"):
        quantize_for_inference("mobile_net", 3, {}, [])


def test_twin_classes_for():
    cal, q = twin_classes_for(FCN(n_classes=4))
    assert isinstance(cal, QuantFCN) and isinstance(q, QuantFCN)
    assert cal.mode == "calibrate" and q.mode == "int8"
    with pytest.raises(ValueError, match="grayscale"):
        twin_classes_for(object())


def test_calibrate_requires_batches():
    cal, _ = QuantFCNSkip.pair(n_classes=3)
    with pytest.raises(ValueError, match="batch"):
        calibrate(cal, {}, [])


# ------------------------------------------------------- integration paths
def _synthetic_page(h, w, seed=0):
    """Structured page (text bars on light ground) so logits are not
    pathologically near-tied the way pure noise makes them."""
    rng = np.random.RandomState(seed)
    page = np.full((h, w), 235, np.uint8)
    for row in range(h // 8, h - 16, 24):
        for col in range(w // 10, w - 12, 14):
            if rng.rand() < 0.8:
                page[row : row + 12, col : col + 8] = rng.randint(10, 60)
    return page


def test_pipeline_int8_agrees_with_float():
    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.pipeline import ThroughputPredictor

    H, W = 192, 160
    pages = np.stack([_synthetic_page(H, W, s) for s in range(4)])
    binaries = ((pages >= 128) * 255).astype(np.uint8)
    m = FCNSkip(n_classes=3)
    params = _params(m)
    kw = dict(page_shape=(H, W), scale=0.5, host_decimate=2, download="pred")
    float_pred = ThroughputPredictor(m, params, DEFAULT_IMAGE_MAP.palette, **kw)
    int8_pred = ThroughputPredictor(
        m, params, DEFAULT_IMAGE_MAP.palette, int8=True, **kw
    )
    ref = np.concatenate([c for c, _, _ in float_pred.run(pages, binaries, batch_size=2)])
    out = np.concatenate([c for c, _, _ in int8_pred.run(pages, binaries, batch_size=2)])
    assert out.shape == ref.shape
    assert (out == ref).mean() >= 0.95
    assert "amax" in int8_pred.variables  # calibration happened once


def test_classifier_int8_agrees_with_float():
    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.classifier import PixelClassifier

    H, W = 96, 80
    images = np.stack([_synthetic_page(H, W, s) for s in range(2)])
    binaries = (images < 128).astype(np.uint8)
    palette = DEFAULT_IMAGE_MAP.palette
    ref_cls = PixelClassifier(n_classes=3, seed=0)
    q_cls = PixelClassifier(n_classes=3, seed=0, int8=True)
    ref_pred, ref_masks = ref_cls.predict_batch_masks(images, binaries, palette)
    q_pred, q_masks = q_cls.predict_batch_masks(images, binaries, palette)
    assert q_pred.shape == ref_pred.shape
    assert (q_pred == ref_pred).mean() >= 0.95
    assert q_masks.shape == ref_masks.shape

def test_pipeline_int8_composes_with_host_vote():
    """int8 composes with the cc-majority host vote in the throughput
    pipeline (the bench's sustained_vote --int8 config): the voted int8
    color mask must equal the vote applied to the int8 no-vote class map
    — i.e. quantization and the vote commute through the pipeline wiring
    (pixel equality vs the FLOAT vote is not the invariant: the vote
    amplifies any argmax flip across its whole component)."""
    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.data.dataset import SingleData
    from page_segmentation_tpu.inference.pipeline import ThroughputPredictor
    from page_segmentation_tpu.inference.postprocess import (
        vote_connected_component_class,
    )

    H, W = 192, 160
    pages = np.stack([_synthetic_page(H, W, s) for s in range(2)])
    binaries = ((pages >= 128) * 255).astype(np.uint8)
    m = FCNSkip(n_classes=3)
    params = _params(m)
    palette = DEFAULT_IMAGE_MAP.palette
    kw = dict(page_shape=(H, W), scale=0.5, host_decimate=2)

    plain = ThroughputPredictor(m, params, palette, int8=True,
                                download="pred", **kw)
    voted = ThroughputPredictor(m, params, palette, int8=True,
                                download="packed", cc_vote="host", **kw)
    # same calibration batch -> identical quantized programs
    base = np.concatenate(
        [c for c, _, _ in plain.run(pages, binaries, batch_size=2)])
    got = np.concatenate(
        [c for c, _, _ in voted.run(pages, binaries, batch_size=2)])

    oh, ow = base.shape[1:3]
    ink = np.zeros((2, oh, ow), np.uint8)  # reconstruct the pipeline's ink
    for i in range(2):
        ink[i] = (binaries[i][plain.row_idx][:, plain.col_idx] < 128)
    # invert the color mask back to class indices (palette rows are unique)
    pred = (base[..., None, :] == palette[None, None, None]).all(-1).argmax(-1)
    for i in range(2):
        want = vote_connected_component_class(
            pred[i].astype(np.int64), SingleData(binary=ink[i]))
        np.testing.assert_array_equal(got[i], palette[want])
