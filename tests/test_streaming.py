"""Streaming (lazy) training data: pixels stay on disk, shapes are peeked
from PNG headers for bucketing, batches materialize transient copies in
the prefetch thread.  The reference loads the whole corpus into memory up
front (dataset.py:193-198 Pool(12)); streaming bounds host memory at
O(batch) for corpora that do not fit."""
import json

import numpy as np
import pytest

from page_segmentation_tpu.core.colors import ColorMap
from page_segmentation_tpu.core.image_io import imsave
from page_segmentation_tpu.data.dataset import list_dataset, SingleData
from page_segmentation_tpu.data.loader import DatasetLoader
from page_segmentation_tpu.data.prepare import prepared_shape
from page_segmentation_tpu.train.metrics import Monitor
from page_segmentation_tpu.train.trainer import Trainer, TrainSettings


@pytest.fixture
def dataset_root(tmp_path):
    cmap = ColorMap({"(255, 255, 255)": (0, "background"), "(255, 0, 0)": (1, "text")})
    root = tmp_path / "ds"
    for sub in ("binary_images", "images", "masks", "normalizations"):
        (root / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    # two page sizes -> two buckets
    for i, (h, w) in enumerate([(64, 48), (64, 48), (80, 56), (80, 56)]):
        mask = np.zeros((h, w), np.uint8)
        mask[h // 4 : -h // 4, w // 6 : -w // 6] = 1
        image = np.where(mask == 1, 40, 230).astype(np.uint8)
        image = np.clip(image + rng.randint(-8, 8, image.shape), 0, 255).astype(np.uint8)
        binary = np.where(mask == 1, 0, 255).astype(np.uint8)
        imsave(root / "images" / f"p{i}.png", image)
        imsave(root / "binary_images" / f"p{i}.png", binary)
        imsave(root / "masks" / f"p{i}.png", cmap.to_rgb_array(mask))
        with open(root / "normalizations" / f"p{i}.json", "w") as f:
            json.dump({"char_height": 8}, f)
    return root, cmap


def _entries(root):
    return [SingleData(**e) for e in list_dataset(str(root), verify_filenames=True)]


def test_lazy_entries_stay_on_disk_with_correct_shapes(dataset_root):
    root, cmap = dataset_root
    loader = DatasetLoader(8, cmap)
    lazy = loader.load_data(_entries(root), lazy=True)
    eager = loader.load_data(_entries(root))
    for lz, eg in zip(lazy.data, eager.data):
        assert lz.image is None and lz.mask is None
        assert lz.loader is loader
        assert tuple(lz.prepared_shape) == tuple(eg.image.shape[:2])


def test_load_lazy_materializes_a_copy(dataset_root):
    root, cmap = dataset_root
    loader = DatasetLoader(8, cmap)
    lazy = loader.load_data(_entries(root), lazy=True)
    entry = lazy.data[0]
    loaded = loader.load_lazy(entry)
    assert loaded.image is not None and loaded.mask is not None
    assert loaded.image.shape[:2] == tuple(entry.prepared_shape)
    # the source entry is untouched: pixels drop with the copy
    assert entry.image is None and entry.mask is None


def test_lazy_rejects_pathless_pixelless_entries(dataset_root):
    """An entry with neither pixels nor a path can never materialize;
    in-memory entries (image set) are fine and pass through untouched."""
    root, cmap = dataset_root
    loader = DatasetLoader(8, cmap)
    with pytest.raises(ValueError, match="image_path"):
        loader.load_data([SingleData()], lazy=True)
    mixed = loader.load_data(
        [SingleData(image=np.zeros((8, 8), np.uint8))], lazy=True)
    assert mixed.data[0].loader is None  # not lazy, nothing to peek


def test_streaming_training_matches_eager(dataset_root, tmp_path):
    """The streaming trajectory is identical to the eager one — the same
    pixels arrive through the same prepare path, only later."""
    import jax

    root, cmap = dataset_root
    loader = DatasetLoader(8, cmap)

    def train(lazy, out):
        data = loader.load_data(_entries(root), lazy=lazy)
        trainer = Trainer(TrainSettings(
            n_epoch=2, n_classes=2, l_rate=1e-3, train_data=data,
            validation_data=None, display=10, threads=1,
            output_dir=str(tmp_path / out),
            monitor=Monitor.LOSS, early_stopping_max_performance_drops=0,
            compute_baseline=True, batch_size=2, seed=0,
        ))
        history = trainer.train()
        return trainer, history

    eager_tr, eager_hist = train(False, "eager")
    lazy_tr, lazy_hist = train(True, "lazy")
    np.testing.assert_allclose(lazy_hist["loss"], eager_hist["loss"], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(eager_tr.params),
                    jax.tree_util.tree_leaves(lazy_tr.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert lazy_tr.baseline == pytest.approx(eager_tr.baseline, rel=1e-6)
    # after training the source entries still hold no pixels
    assert all(d.image is None for d in lazy_tr.settings.train_data.data)


def test_streaming_cli_flag(dataset_root, tmp_path):
    from page_segmentation_tpu.cli.main import main

    root, cmap = dataset_root
    cmap.save(root / "image_map.json")
    dataset_json = tmp_path / "dataset.json"
    rc = main([
        "create-dataset-file", "--dataset_path", str(root),
        "--output_file", str(dataset_json),
        "--n_train", "4", "--n_test", "0", "--n_eval", "0",
    ])
    assert rc == 0
    model_dir = tmp_path / "model_out"
    rc = main([
        "train", "--train", str(dataset_json), "--output", str(model_dir),
        "--n_iter", "4", "--color_map", str(root / "image_map.json"),
        "--streaming",
    ])
    assert rc == 0
    assert (model_dir / "model" / "params.msgpack").exists()


def test_streaming_predict_matches_eager(dataset_root):
    """Both predict paths (per-page and batched-fused) give identical
    labels on a lazy dataset, and the source entries stay on disk."""
    from page_segmentation_tpu.inference.classifier import PixelClassifier
    from page_segmentation_tpu.inference.predictor import Predictor, PredictSettings

    root, cmap = dataset_root
    loader = DatasetLoader(8, cmap, prediction=True)
    eager = loader.load_data(_entries(root))
    lazy = loader.load_data(_entries(root), lazy=True)
    network = PixelClassifier(n_classes=2, seed=0)
    predictor = Predictor(PredictSettings(color_map=cmap, n_classes=2), network=network)

    eager_preds = [p.labels for p in predictor.predict(eager)]
    lazy_preds = [p.labels for p in predictor.predict(lazy)]
    for a, b in zip(eager_preds, lazy_preds):
        np.testing.assert_array_equal(a, b)
    assert all(d.image is None for d in lazy.data)

    eager_fast = {id(r[0]): r[1] for r in predictor.predict_dataset_fast(eager, batch_size=2)}
    lazy_fast = [r[1] for r in predictor.predict_dataset_fast(lazy, batch_size=2)]
    assert len(lazy_fast) == len(eager_fast) == 4
    for a, b in zip(eager_fast.values(), lazy_fast):
        np.testing.assert_array_equal(a, b)
    assert all(d.image is None for d in lazy.data)


def test_streaming_mesh_training(dataset_root, tmp_path):
    """Streaming composes with data-parallel mesh training: lazy entries
    load in the prefetch thread, batches shard over the virtual mesh."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    root, cmap = dataset_root
    loader = DatasetLoader(8, cmap)
    data = loader.load_data(_entries(root), lazy=True)
    trainer = Trainer(TrainSettings(
        n_epoch=2, n_classes=2, l_rate=1e-3, train_data=data,
        validation_data=None, display=10, threads=1,
        output_dir=str(tmp_path / "out"),
        monitor=Monitor.LOSS, early_stopping_max_performance_drops=0,
        batch_size=2, n_devices=2, seed=0,
    ))
    history = trainer.train()
    assert len(history["loss"]) == 2
    assert np.isfinite(history["loss"]).all()
    assert all(d.image is None for d in data.data)
