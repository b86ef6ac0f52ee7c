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
