import numpy as np
import pytest

import page_segmentation_tpu as pst
from page_segmentation_tpu.core.colors import ColorMap
from page_segmentation_tpu.data.dataset import Dataset, SingleData
from page_segmentation_tpu.models.registry import Architecture, Optimizers
from page_segmentation_tpu.train.metrics import Loss, Monitor
from page_segmentation_tpu.train.trainer import AugmentationSettings, Trainer, TrainSettings


def _synthetic_dataset(n_pages=3, h=40, w=32, seed=0):
    rng = np.random.RandomState(seed)
    cmap = ColorMap(
        {"(255, 255, 255)": (0, "background"), "(255, 0, 0)": (1, "text")}
    )
    pages = []
    for _ in range(n_pages):
        mask = np.zeros((h, w), np.uint8)
        mask[10:30, 5:25] = 1
        image = np.where(mask == 1, 200, 10).astype(np.uint8)
        image = np.clip(image + rng.randint(-5, 5, image.shape), 0, 255).astype(np.uint8)
        binary = (mask == 1).astype(np.uint8)
        pages.append(SingleData(image=image, binary=binary, mask=mask))
    return Dataset(pages, cmap)


def _settings(tmp_path, train_data, **kwargs):
    defaults = dict(
        n_epoch=3,
        n_classes=2,
        l_rate=1e-3,
        train_data=train_data,
        validation_data=None,
        display=10,
        output_dir=str(tmp_path / "out"),
        threads=1,
        monitor=Monitor.LOSS,
        early_stopping_max_performance_drops=0,
        reduce_lr_on_plateau=False,
    )
    defaults.update(kwargs)
    return TrainSettings(**defaults)


def test_train_loss_decreases(tmp_path):
    data = _synthetic_dataset()
    trainer = Trainer(_settings(tmp_path, data, n_epoch=5))
    history = trainer.train()
    assert len(history["loss"]) == 5
    assert history["loss"][-1] < history["loss"][0]


def test_train_writes_checkpoint_and_scalars(tmp_path):
    data = _synthetic_dataset()
    trainer = Trainer(_settings(tmp_path, data, n_epoch=2))
    trainer.train()
    ckpt = tmp_path / "out" / "model"
    assert (ckpt / "params.msgpack").exists()
    assert (ckpt / "meta.json").exists()
    assert (tmp_path / "out" / "scalars.jsonl").exists()


def test_train_export_h5(tmp_path):
    # the reference's checkpoint artifact is a Keras-legacy .h5 written on
    # every save (reference network.py:177-183); export_h5 mirrors that
    from page_segmentation_tpu.models.h5_import import load_keras_variables

    data = _synthetic_dataset()
    trainer = Trainer(_settings(tmp_path, data, n_epoch=1, export_h5=True))
    trainer.train()
    h5 = tmp_path / "out" / "model.h5"
    assert h5.exists()
    variables, detected = load_keras_variables(str(h5), Architecture.FCN_SKIP, 2)
    np.testing.assert_array_equal(
        np.asarray(trainer.params["conv1"]["kernel"]),
        variables["params"]["conv1"]["kernel"],
    )


def test_checkpoint_loadable_by_classifier(tmp_path):
    data = _synthetic_dataset()
    trainer = Trainer(_settings(tmp_path, data, n_epoch=3))
    trainer.train()
    net = pst.PixelClassifier(n_classes=2, model_path=str(tmp_path / "out" / "model"))
    _, _, pred = net.predict_single_data(data.data[0])
    assert pred.shape == data.data[0].image.shape


def test_train_with_validation_and_early_stopping(tmp_path):
    data = _synthetic_dataset()
    val = _synthetic_dataset(n_pages=2, seed=1)
    settings = _settings(
        tmp_path,
        data,
        validation_data=val,
        n_epoch=4,
        monitor=Monitor.VAL_LOSS,
        early_stopping_max_performance_drops=2,
    )
    trainer = Trainer(settings)
    history = trainer.train()
    assert len(history["val_loss"]) == len(history["loss"])


def test_train_with_augmentation(tmp_path):
    data = _synthetic_dataset()
    settings = _settings(
        tmp_path,
        data,
        n_epoch=2,
        data_augmentation=True,
        data_augmentation_settings=AugmentationSettings(),
    )
    history = Trainer(settings).train()
    assert np.isfinite(history["loss"]).all()


def test_train_foreground_masks(tmp_path):
    data = _synthetic_dataset()
    history = Trainer(_settings(tmp_path, data, n_epoch=2, foreground_masks=True)).train()
    assert np.isfinite(history["loss"]).all()


def test_train_batch_size_2(tmp_path):
    data = _synthetic_dataset(n_pages=4)
    history = Trainer(_settings(tmp_path, data, n_epoch=2, batch_size=2)).train()
    assert np.isfinite(history["loss"]).all()


def test_train_data_parallel_mesh(tmp_path):
    """Data-parallel training over a 4-device virtual mesh."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    data = _synthetic_dataset(n_pages=4)
    settings = _settings(tmp_path, data, n_epoch=3, batch_size=4, n_devices=4)
    history = Trainer(settings).train()
    assert history["loss"][-1] < history["loss"][0]


def test_mesh_matches_single_device(tmp_path):
    """One mesh step == one single-device step on the same batch."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    data = _synthetic_dataset(n_pages=2)
    s_single = _settings(tmp_path, data, n_epoch=1, batch_size=2, seed=7)
    s_mesh = _settings(tmp_path, data, n_epoch=1, batch_size=2, n_devices=2, seed=7)
    t1 = Trainer(s_single)
    t2 = Trainer(s_mesh)
    h1 = t1.train()
    h2 = t2.train()
    # same seed, same data, grads averaged identically -> same loss trajectory
    np.testing.assert_allclose(h1["loss"], h2["loss"], rtol=2e-4)


def test_compute_baseline(tmp_path):
    data = _synthetic_dataset()
    trainer = Trainer(_settings(tmp_path, data, n_epoch=1, compute_baseline=True))
    assert 0.5 < trainer.baseline < 1.0


def test_empty_train_data_raises(tmp_path):
    cmap = ColorMap({"(255, 255, 255)": (0, "bg")})
    with pytest.raises(Exception, match="No training files"):
        Trainer(_settings(tmp_path, Dataset([], cmap), n_epoch=1))


def test_progress_callback(tmp_path):
    calls = {"init": 0, "loss": 0, "best": 0}

    class CB(pst.__getattr__("Trainer").__init__.__globals__["TrainProgressCallback"]):
        def init(self, total, early):
            calls["init"] += 1

        def update_loss(self, batch, loss, acc):
            calls["loss"] += 1

        def next_best(self, epoch, acc, n_best):
            calls["best"] += 1

    data = _synthetic_dataset()
    Trainer(_settings(tmp_path, data, n_epoch=2)).train(callback=CB())
    assert calls["init"] == 1
    assert calls["loss"] == 6  # 3 pages x 2 epochs
    assert calls["best"] >= 1


def test_ragged_mesh_metrics_match_single_device(tmp_path):
    """A ragged batch (padded to the mesh with weights=0 rows) must report
    the same loss/accuracy as the identical batch on one device — padding
    shards contribute nothing to the weighted cross-shard reduction."""
    import jax
    import jax.numpy as jnp
    import optax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from page_segmentation_tpu.models.fcn import FCNSkip
    from page_segmentation_tpu.parallel.mesh import make_mesh, shard_batch
    from page_segmentation_tpu.train.steps import make_step_fns

    module = FCNSkip(n_classes=2)
    rng = np.random.RandomState(3)
    h = w = 32
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 1)))["params"]
    optimizer = optax.sgd(1e-2)
    opt_state = optimizer.init(params)

    # 5 real pages + 3 pure-padding rows -> 8 shards, 3 of them all-padding
    n_real, n_total = 5, 8
    batch = {
        "image": np.zeros((n_total, h, w, 1), np.float32),
        "mask": np.zeros((n_total, h, w), np.int32),
        "binary": np.zeros((n_total, h, w), np.uint8),
        "weights": np.zeros((n_total, h, w), np.float32),
    }
    batch["image"][:n_real] = rng.rand(n_real, h, w, 1)
    batch["mask"][:n_real] = rng.randint(0, 2, (n_real, h, w))
    batch["binary"][:n_real] = 1
    batch["weights"][:n_real] = 1.0

    single_train, single_eval = make_step_fns(module, optimizer, Loss.CATEGORICAL_CROSSENTROPY(), donate=False)
    mesh = make_mesh(8)
    mesh_train, mesh_eval = make_step_fns(module, optimizer, Loss.CATEGORICAL_CROSSENTROPY(), mesh=mesh, donate=False)

    # single-device oracle sees only the REAL pages (no padding), mesh
    # sees the padded batch: every metric must agree
    real = {k: v[:n_real] for k, v in batch.items()}
    m_single = single_eval(params, {}, real)
    m_mesh = mesh_eval(params, {}, shard_batch(mesh, batch))
    for key in ("loss", "accuracy", "fgpa", "jacard_coef", "dice_coef"):
        np.testing.assert_allclose(
            float(m_mesh[key]), float(m_single[key]), rtol=1e-5,
            err_msg=f"metric {key} biased by mesh padding")

    # the train-step gradient must also be the single-device gradient
    key = jax.random.PRNGKey(1)
    p1, _, _, mt1 = single_train(params, {}, opt_state, batch, key)
    p2, _, _, mt2 = mesh_train(params, {}, opt_state, shard_batch(mesh, batch), key)
    np.testing.assert_allclose(float(mt2["loss"]), float(mt1["loss"]), rtol=1e-5)
    leaves1 = jax.tree_util.tree_leaves(p1)
    leaves2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_compact_transfer_matches_float_layout(tmp_path):
    """The uint8 compact transfer (device-side normalize + weights) must
    reproduce the float layout's loss trajectory (no augmentation, so the
    pixels are integers and /255 is bit-identical on either side)."""
    data = _synthetic_dataset(n_pages=3)
    h_compact = Trainer(
        _settings(tmp_path / "a", data, n_epoch=2, compact_transfer=True)
    ).train()
    h_float = Trainer(
        _settings(tmp_path / "b", data, n_epoch=2, compact_transfer=False)
    ).train()
    np.testing.assert_allclose(h_compact["loss"], h_float["loss"], rtol=1e-5)


def test_compact_transfer_mesh(tmp_path):
    """Compact batches through the shard_map step (dims-keyed specs)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    data = _synthetic_dataset(n_pages=4)
    settings = _settings(tmp_path, data, n_epoch=2, batch_size=4, n_devices=4,
                         compact_transfer=True)
    history = Trainer(settings).train()
    assert history["loss"][-1] < history["loss"][0]


def test_train_mixed_page_sizes(tmp_path):
    """Pages of different sizes: bucketed batches, ragged groups, compact
    transfers — loss decreases and eval runs."""
    cmap = ColorMap({"(255, 255, 255)": (0, "background"), "(255, 0, 0)": (1, "text")})
    rng = np.random.RandomState(0)
    pages = []
    for h, w in [(40, 32), (40, 32), (72, 48), (72, 48), (56, 64)]:
        mask = np.zeros((h, w), np.uint8)
        mask[h // 4 : -h // 4, w // 4 : -w // 4] = 1
        image = np.where(mask == 1, 200, 10).astype(np.uint8)
        image = np.clip(image + rng.randint(-5, 5, image.shape), 0, 255).astype(np.uint8)
        pages.append(SingleData(image=image, binary=(mask == 1).astype(np.uint8), mask=mask))
    data = Dataset(pages, cmap)
    settings = _settings(tmp_path, data, n_epoch=3, batch_size=2, validation_data=data)
    history = Trainer(settings).train()
    assert history["loss"][-1] < history["loss"][0]
    assert np.isfinite(history["val_loss"][-1])


def test_compact_unpack_zeroes_padding_for_imagenet_modes():
    """Device normalization maps raw-zero bucket padding to nonzero values
    for the imagenet modes; unpack must re-zero it so compact batches feed
    the same activations as the float layout (preprocess-then-pad-zeros)."""
    import jax
    import jax.numpy as jnp
    import optax

    import flax.linen as nn
    from page_segmentation_tpu.models.registry import Architecture
    from page_segmentation_tpu.train.metrics import Loss
    from page_segmentation_tpu.train.steps import make_step_fns

    class Probe(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(2, (1, 1))(x)

    module = Probe()
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    opt = optax.sgd(1e-2)
    dp = Architecture.MOBILE_NET.device_preprocess()  # maps 0 -> -1
    _, eval_step = make_step_fns(module, opt, Loss.CATEGORICAL_CROSSENTROPY(),
                                 device_preprocess=dp, donate=False)

    rng = np.random.RandomState(0)
    h = w = 8
    valid_h, valid_w = 5, 6
    image_u8 = np.zeros((1, h, w, 3), np.uint8)
    image_u8[0, :valid_h, :valid_w] = rng.randint(0, 256, (valid_h, valid_w, 3))
    compact = {
        "image": image_u8,
        "mask": np.zeros((1, h, w), np.uint8),
        "binary": np.ones((1, h, w), np.uint8),
        "dims": np.int32([[valid_h, valid_w]]),
    }
    # float layout: preprocess then pad with zeros
    x_float = np.zeros((1, h, w, 3), np.float32)
    x_float[0, :valid_h, :valid_w] = np.asarray(
        Architecture.MOBILE_NET.preprocess()[0](image_u8[0, :valid_h, :valid_w].astype(np.float32))
    )
    weights = np.zeros((1, h, w), np.float32)
    weights[0, :valid_h, :valid_w] = 1.0
    float_batch = {
        "image": x_float,
        "mask": np.zeros((1, h, w), np.int32),
        "binary": np.ones((1, h, w), np.uint8),
        "weights": weights,
    }
    m_compact = eval_step(params, {}, compact)
    m_float = eval_step(params, {}, float_batch)
    np.testing.assert_allclose(float(m_compact["loss"]), float(m_float["loss"]), rtol=1e-6)


def test_weighted_means_page_count():
    """Epoch/eval averages weight batches by page count, not equally —
    a ragged tail batch must not be over-weighted."""
    from page_segmentation_tpu.train.trainer import _weighted_means

    batches = [(4, {"loss": 1.0}), (1, {"loss": 6.0})]
    out = _weighted_means(batches)
    assert out["loss"] == pytest.approx((4 * 1.0 + 1 * 6.0) / 5)


def test_grad_accum_matches_large_batch(tmp_path):
    """grad_accum=k at batch 1 reproduces the batch-k trajectory:
    equal-shape pages make every micro-gradient an equal-mass pixel mean,
    so MultiSteps' equal-weight average of k micro-grads equals the
    large-batch weighted mean (FCN_SKIP has no dropout, so the per-step
    RNG split is inert).  SGD so the comparison is linear in the gradient
    — Adam's m̂/√v̂ is a sign function near zero-gradient entries and
    amplifies fp32 conv-batching noise (~1e-7) to full update size."""
    data = _synthetic_dataset(n_pages=4)
    # compare end-of-training params: best-epoch restoration would compare
    # different epochs (the accum run's *monitored* epoch loss averages
    # micro-steps evaluated at stale params, so the trajectories differ
    # even though the applied updates are identical)
    big = Trainer(
        _settings(
            tmp_path / "big", data, n_epoch=3, batch_size=4,
            optimizer=Optimizers.SGD,
            early_stopping_restore_best_weights=False,
        )
    )
    big.train()
    accum = Trainer(
        _settings(
            tmp_path / "acc", data, n_epoch=3, batch_size=1, grad_accum=4,
            optimizer=Optimizers.SGD,
            early_stopping_restore_best_weights=False,
        )
    )
    accum.train()
    import jax

    for path, a, b in zip(
        jax.tree_util.tree_leaves_with_path(big.params),
        jax.tree_util.tree_leaves(big.params),
        jax.tree_util.tree_leaves(accum.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6, err_msg=str(path[0])
        )


def test_grad_accum_set_lr_reaches_inner_state(tmp_path):
    """ReduceLROnPlateau must find the inject_hyperparams state inside the
    MultiSteps wrapper."""
    data = _synthetic_dataset(n_pages=2)
    trainer = Trainer(_settings(tmp_path, data, n_epoch=1, grad_accum=2))
    trainer._set_lr(3e-4)
    lr = float(trainer.opt_state.inner_opt_state.hyperparams["learning_rate"])
    assert lr == pytest.approx(3e-4)


def test_skip_nonfinite_step_guard():
    """A step with non-finite loss/grads leaves params, optimizer state and
    metrics' nonfinite flag set; the next finite step updates normally."""
    import jax
    import jax.numpy as jnp
    import optax

    from page_segmentation_tpu.inference.classifier import PixelClassifier
    from page_segmentation_tpu.train.metrics import Loss
    from page_segmentation_tpu.train.steps import make_step_fns

    classifier = PixelClassifier(n_classes=2, seed=0)
    params = classifier.params
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    train_step, _ = make_step_fns(
        classifier.module, optimizer, Loss.CATEGORICAL_CROSSENTROPY(),
        donate=False, skip_nonfinite=True,
    )
    h, w = 32, 32
    ok = {
        "image": np.full((1, h, w, 1), 0.5, np.float32),
        "mask": np.zeros((1, h, w), np.int32),
        "binary": np.ones((1, h, w), np.uint8),
        "weights": np.ones((1, h, w), np.float32),
    }
    bad = {**ok, "image": np.full((1, h, w, 1), np.inf, np.float32)}
    before = jax.device_get(params)
    rng = jax.random.PRNGKey(0)

    p1, ms1, os1, m1 = train_step(params, {}, opt_state, bad, rng)
    assert float(m1["nonfinite"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    p2, ms2, os2, m2 = train_step(p1, ms1, os1, ok, rng)
    assert float(m2["nonfinite"]) == 0.0
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(p2))
    )
    assert changed


def test_trainer_skip_nonfinite_clean_run(tmp_path):
    """With the guard armed, a healthy run trains normally and records a
    zero nonfinite rate."""
    data = _synthetic_dataset()
    trainer = Trainer(_settings(tmp_path, data, n_epoch=2, skip_nonfinite=3))
    history = trainer.train()
    assert len(history["loss"]) == 2
    assert history["loss"][-1] <= history["loss"][0]


def test_trainer_skip_nonfinite_aborts(tmp_path):
    """The Trainer aborts with a clear error after N consecutive
    non-finite steps (states kept at the last finite point)."""
    data = _synthetic_dataset()
    trainer = Trainer(_settings(tmp_path, data, n_epoch=2, skip_nonfinite=2))
    real_step = trainer._train_step

    def poisoned(params, model_state, opt_state, batch, rng):
        p, ms, os_, metrics = real_step(params, model_state, opt_state, batch, rng)
        return p, ms, os_, {**metrics, "nonfinite": 1.0}

    trainer._train_step = poisoned
    with pytest.raises(RuntimeError, match="non-finite"):
        trainer.train()


def test_lr_schedule_cosine_decays(tmp_path):
    """Cosine schedule: the logged lr decays monotonically over epochs and
    reaches the configured floor fraction by the end of the run."""
    data = _synthetic_dataset(n_pages=3)
    trainer = Trainer(_settings(
        tmp_path, data, n_epoch=4, lr_schedule="cosine",
        lr_min_fraction=0.1, reduce_lr_on_plateau=True,  # superseded
    ))
    history = trainer.train()
    lrs = history["lr"]
    assert all(b < a for a, b in zip(lrs, lrs[1:]))
    # the last applied update sits one step before the curve's end, so the
    # logged lr is near (not exactly at) the floor
    assert 1e-3 * 0.1 <= lrs[-1] < 1e-3 * 0.2


def test_lr_schedule_warmup_rises_then_falls(tmp_path):
    data = _synthetic_dataset(n_pages=3)
    trainer = Trainer(_settings(
        tmp_path, data, n_epoch=4, lr_schedule="cosine",
        lr_warmup_steps=6,  # 2 epochs x 3 steps
    ))
    history = trainer.train()
    lrs = history["lr"]
    assert lrs[1] > lrs[0]  # warming up
    assert lrs[-1] < lrs[1]  # decaying


def test_lr_schedule_resumes_on_curve(tmp_path):
    """An interrupted cosine run continues the curve exactly: the schedule
    step count restores with the optimizer state."""
    data = _synthetic_dataset(n_pages=3)
    kwargs = dict(
        lr_schedule="cosine", lr_min_fraction=0.05, lr_decay_steps=12,
        save_best_model_only=False,
        early_stopping_restore_best_weights=False,
    )
    full = Trainer(_settings(tmp_path / "full", data, n_epoch=4, **kwargs))
    full_hist = full.train()

    part = Trainer(_settings(tmp_path / "part", data, n_epoch=2, **kwargs))
    part.train()
    resumed = Trainer(_settings(
        tmp_path / "part", data, n_epoch=4, continue_training=True,
        load=str(tmp_path / "part" / "out" / "model"), **kwargs,
    ))
    resumed_hist = resumed.train()
    np.testing.assert_allclose(
        resumed_hist["lr"], full_hist["lr"][2:], rtol=1e-6)


def _minority_dataset(n_pages=6, h=40, w=32):
    """Pages 0..n-2 are background/text; the LAST page is mostly a rare
    third 'image' class (~a few % of corpus pixels overall)."""
    cmap = ColorMap({"(255, 255, 255)": (0, "background"),
                     "(255, 0, 0)": (1, "text"),
                     "(0, 255, 0)": (2, "image")})
    pages = []
    for i in range(n_pages):
        mask = np.zeros((h, w), np.uint8)
        if i == n_pages - 1:
            mask[5:35, 5:27] = 2
        else:
            mask[10:30, 5:25] = 1
        image = np.where(mask > 0, 200, 10).astype(np.uint8)
        binary = (mask > 0).astype(np.uint8)
        pages.append(SingleData(image=image, binary=binary, mask=mask))
    return Dataset(pages, cmap)


def test_balanced_sampling_off_is_default_epoch(tmp_path):
    """Equivalence gate: sampling off draws the exact batches the
    pre-sampler trainer drew (every page once, same rng stream)."""
    data = _minority_dataset()
    trainer = Trainer(_settings(tmp_path, data, n_classes=3))
    rng1 = np.random.default_rng([0, 0])
    rng2 = np.random.default_rng([0, 0])
    batches = trainer._bucketed_batches(data, 1, shuffle_rng=rng1)
    # re-derive by hand: same grouping + same shuffles
    members = list(data.data)
    rng2.shuffle(members)
    order = [[m] for m in members]
    rng2.shuffle(order)
    assert [id(b[0]) for b in batches] == [id(b[0]) for b in order]
    # every page exactly once
    assert sorted(id(d) for b in batches for d in b) == sorted(
        id(d) for d in data.data)


def test_balanced_sampling_boosts_minority_pages(tmp_path):
    data = _minority_dataset()
    trainer = Trainer(_settings(
        tmp_path, data, n_classes=3, balanced_sampling=True))
    rng = np.random.default_rng(0)
    minority = data.data[-1]
    counts = []
    for _ in range(50):
        batches = trainer._bucketed_batches(data, 1, shuffle_rng=rng)
        assert sum(len(b) for b in batches) == len(data.data)
        counts.append(sum(d is minority for b in batches for d in b))
    mean = np.mean(counts)
    # uniform sampling would give 1.0 draw per epoch; the weighted draw
    # must clearly exceed it (the page's rare class dominates its pixels)
    assert mean > 1.8, mean
    # eval path (no rng) must NOT resample
    eval_batches = trainer._bucketed_batches(data, 1)
    assert sorted(id(d) for b in eval_batches for d in b) == sorted(
        id(d) for d in data.data)


def test_balanced_sampling_trains(tmp_path):
    data = _minority_dataset()
    trainer = Trainer(_settings(
        tmp_path, data, n_classes=3, n_epoch=4, balanced_sampling=True))
    history = trainer.train()
    assert history["loss"][-1] < history["loss"][0]


def test_balanced_sampling_lazy_raises(tmp_path):
    data = _minority_dataset()
    for d in data.data:
        d.mask = None
    trainer = Trainer(_settings(
        tmp_path, data, n_classes=3, balanced_sampling=True))
    with pytest.raises(ValueError, match="eager-loaded masks"):
        trainer._bucketed_batches(data, 1, shuffle_rng=np.random.default_rng(0))


def test_class_weighting_trains_and_boosts_minority_gradient(tmp_path):
    """class_weighting scales minority-class loss contribution: with
    beta=1 the rare class's weight is ~1/freq-normalized; training still
    converges and the weighted loss decreases."""
    data = _minority_dataset()
    trainer = Trainer(_settings(
        tmp_path, data, n_classes=3, n_epoch=8, class_weighting=1.0))
    freq = trainer._corpus_class_freq(data.data)
    raw = freq ** -1.0
    expected = raw / (freq * raw).sum()
    # minority class (2) gets the largest weight, mean pixel weight == 1
    assert expected[2] == expected.max()
    assert np.isclose((freq * expected).sum(), 1.0)
    history = trainer.train()
    # the weighted loss is noisier per-epoch than CCE on this tiny
    # corpus; training must still clearly progress over the run
    assert min(history["loss"]) < 0.7 * history["loss"][0]


def test_class_weighting_off_matches_baseline(tmp_path):
    """beta=0 must be the exact pre-knob program: identical training
    trajectory to a Trainer without the setting touched."""
    data = _minority_dataset(n_pages=3)
    t1 = Trainer(_settings(tmp_path, data, n_classes=3, n_epoch=2,
                           output_dir=str(tmp_path / "a")))
    h1 = t1.train()
    data2 = _minority_dataset(n_pages=3)
    t2 = Trainer(_settings(tmp_path, data2, n_classes=3, n_epoch=2,
                           class_weighting=0.0,
                           output_dir=str(tmp_path / "b")))
    h2 = t2.train()
    np.testing.assert_allclose(h1["loss"], h2["loss"], rtol=1e-6)


def test_class_weighting_lazy_raises(tmp_path):
    data = _minority_dataset()
    for d in data.data:
        d.mask = None
    with pytest.raises(ValueError, match="eager-loaded masks"):
        Trainer(_settings(tmp_path, data, n_classes=3, class_weighting=0.5))


def test_balanced_sampling_strength_zero_is_uniform(tmp_path):
    """strength 0 draws uniformly (still with replacement)."""
    data = _minority_dataset()
    trainer = Trainer(_settings(
        tmp_path, data, n_classes=3, balanced_sampling=True,
        balanced_sampling_strength=0.0))
    w = trainer._page_class_weights(data.data)
    np.testing.assert_allclose(w, np.full(len(data.data), 1 / len(data.data)))
