import numpy as np

from page_segmentation_tpu.utils import gray_to_rgb, image_to_batch, preserving_resize


def test_gray_to_rgb():
    gray = np.zeros((4, 5))
    rgb = gray_to_rgb(gray)
    assert rgb.shape == (4, 5, 3)
    already = np.zeros((4, 5, 3))
    assert gray_to_rgb(already) is already


def test_image_to_batch():
    assert image_to_batch(np.zeros((4, 5))).shape == (1, 4, 5, 1)
    assert image_to_batch(np.zeros((4, 5, 3))).shape == (1, 4, 5, 3)


def test_preserving_resize():
    img = np.array([[1, 2], [3, 4]], np.uint8)
    out = preserving_resize(img, (4, 4))
    assert set(np.unique(out)) <= {1, 2, 3, 4}


def test_time_fn():
    import jax.numpy as jnp

    from page_segmentation_tpu.train.profiling import time_fn

    stats = time_fn(lambda: jnp.ones((8, 8)) * 2, iters=3, warmup=1, items_per_call=4)
    assert stats["mean_ms"] >= 0
    assert stats["items_per_sec"] > 0
    assert len(stats["times"]) == 3


def test_tensorboard_writer_fallback(tmp_path, monkeypatch):
    """Without TF the writer degrades to PNG dumps."""
    import builtins

    real_import = builtins.__import__

    def no_tf(name, *args, **kwargs):
        if name == "tensorflow":
            raise ImportError("blocked")
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", no_tf)
    from page_segmentation_tpu.train.callbacks import TensorboardWriter

    writer = TensorboardWriter(str(tmp_path))
    writer.save_image("0-1/Input", np.zeros((1, 8, 8, 3), np.uint8))
    writer.save_scalar("loss", 0.5, 0)
    writer.close()
    import os

    assert any(f.endswith(".png") for f in os.listdir(tmp_path))


def test_scalar_logger(tmp_path):
    from page_segmentation_tpu.train.callbacks import ScalarLogger

    logger = ScalarLogger(str(tmp_path))
    logger.log(epoch=0, loss=np.float32(1.5))
    logger.close()
    import json

    record = json.loads(open(logger.path).read().strip())
    assert record["loss"] == 1.5


def test_gray_to_rgb_batched_stack():
    """(N, H, W) page stacks broadcast to (N, H, W, 3), data intact."""
    stack = np.arange(24).reshape(2, 3, 4).astype(np.uint8)
    rgb = gray_to_rgb(stack)
    assert rgb.shape == (2, 3, 4, 3)
    np.testing.assert_array_equal(rgb[..., 0], stack)
    np.testing.assert_array_equal(rgb[..., 2], stack)


def test_gray_to_rgb_single_channel_rank():
    """(H, W, 1) input gains channels, not a fourth axis."""
    from page_segmentation_tpu.utils import gray_to_rgb

    out = gray_to_rgb(np.zeros((10, 8, 1), np.uint8))
    assert out.shape == (10, 8, 3)
    out2 = gray_to_rgb(np.zeros((10, 8), np.uint8))
    assert out2.shape == (10, 8, 3)


def test_fgpa_blank_binary_scores_zero():
    """A page with no foreground scores 0 instead of crashing (matches the
    in-graph twin's guard)."""
    from page_segmentation_tpu.evaluation.image_ops import fgpa

    pred = np.zeros((8, 8), np.int64)
    mask = np.zeros((8, 8), np.int64)
    assert fgpa(pred, mask, np.zeros((8, 8), np.int64)) == 0


def test_cc_eval_only_label_zero_filters():
    """only_label(0, t) must actually filter (a falsy check used to
    disable it for label 0)."""
    from page_segmentation_tpu.evaluation.metrics import ConnectedComponentEval

    binary = np.zeros((8, 8), np.uint8)
    binary[1:4, 1:4] = 1   # one component: all label 1 in the mask
    mask = np.ones((8, 8), np.int64)
    pred = np.ones((8, 8), np.int64)
    seen = []
    ConnectedComponentEval(binary, mask, pred).only_label(0, 0.9).run_per_component(
        lambda m, p: seen.append(1))
    assert seen == []  # the component is 0% label-0: filtered out


def test_output_data_absolute_path_keeps_all_three(tmp_path):
    """An absolute output_path writes the trio into color/overlay/inverted
    subdirs (the reference collides all three onto one file)."""
    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.data.dataset import SingleData
    from page_segmentation_tpu.inference.output import output_data

    out = tmp_path / "abs"
    data = SingleData(
        image=np.full((8, 8), 200, np.uint8),
        binary=np.ones((8, 8), np.uint8),
        output_path=str(out / "page.png"),
    )
    output_data(str(tmp_path / "unused"), np.zeros((8, 8), np.int64), data,
                DEFAULT_IMAGE_MAP)
    for sub in ("color", "overlay", "inverted"):
        assert (out / sub / "page.png").exists()
