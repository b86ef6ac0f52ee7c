import numpy as np
import pytest

from page_segmentation_tpu.train.checkpoint import (
    OrbaxCheckpointer,
    load_checkpoint,
    load_opt_state,
    save_checkpoint,
)


def test_msgpack_roundtrip_with_collections(tmp_path):
    variables = {
        "params": {"conv": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)}},
        "batch_stats": {"bn": {"mean": np.zeros(3, np.float32)}},
    }
    save_checkpoint(str(tmp_path / "ckpt"), variables, meta={"architecture": "fcn_skip"})
    loaded, meta = load_checkpoint(str(tmp_path / "ckpt"))
    assert meta["architecture"] == "fcn_skip"
    np.testing.assert_array_equal(loaded["params"]["conv"]["kernel"], variables["params"]["conv"]["kernel"])
    np.testing.assert_array_equal(loaded["batch_stats"]["bn"]["mean"], 0.0)


def test_bare_params_wrapped(tmp_path):
    params = {"conv": {"kernel": np.ones((2, 2), np.float32)}}
    save_checkpoint(str(tmp_path / "ckpt"), params)
    loaded, _ = load_checkpoint(str(tmp_path / "ckpt"))
    assert "params" in loaded
    np.testing.assert_array_equal(loaded["params"]["conv"]["kernel"], 1.0)


def test_opt_state_roundtrip(tmp_path):
    import jax
    import optax

    params = {"w": np.ones(3, np.float32)}
    opt = optax.adam(1e-3)
    state = opt.init(params)
    save_checkpoint(str(tmp_path / "ckpt"), params, opt_state=state)
    template = opt.init(params)
    restored = load_opt_state(str(tmp_path / "ckpt"), template)
    chex_leaves = jax.tree_util.tree_leaves(restored)
    assert len(chex_leaves) == len(jax.tree_util.tree_leaves(state))


def test_orbax_manager(tmp_path):
    ckpt = OrbaxCheckpointer(str(tmp_path / "orbax"), max_to_keep=2)
    variables = {"params": {"layer": {"kernel": np.full((2, 2), 3.0, np.float32)}}}
    for step in range(3):
        ckpt.save(step, variables, meta={"epoch": step})
    ckpt.wait()
    step, state, meta = ckpt.restore()
    assert step == 2 and meta["epoch"] == 2
    np.testing.assert_array_equal(state["variables"]["params"]["layer"]["kernel"], 3.0)
    assert ckpt.manager.all_steps() == [1, 2]  # max_to_keep pruning
    ckpt.close()


def test_legacy_meta_triggers_migration(tmp_path):
    """The reference's TF1 trigger (a .meta next to the missing .h5,
    network.py:60-68) now attempts the native migration
    (models/tf1_import.py) — a corrupt meta graph fails with a clear
    error, not a protobuf traceback.  Real-checkpoint round-trips live in
    tests/test_tf1_import.py."""
    pytest.importorskip("tensorflow")  # the migration reads via TF
    from page_segmentation_tpu.inference.classifier import PixelClassifier

    (tmp_path / "old.meta").write_bytes(b"tf1")
    with pytest.raises(ValueError, match="not a valid TF1 meta graph"):
        PixelClassifier(n_classes=2, model_path=str(tmp_path / "old.h5"))


def test_optimizer_state_resume_matches_uninterrupted(tmp_path):
    """Train 4 epochs straight vs 2 epochs + resume-from-checkpoint for 2
    more: the loss trajectories must match (optimizer moments, LR, and the
    per-epoch RNG streams all restore exactly)."""
    import numpy as np

    from tests.test_train import _settings, _synthetic_dataset

    from page_segmentation_tpu.train.trainer import Trainer

    data = _synthetic_dataset(n_pages=3)

    full = Trainer(_settings(tmp_path / "full", data, n_epoch=4, save_best_model_only=False))
    h_full = full.train()

    part = Trainer(_settings(tmp_path / "part", data, n_epoch=2, save_best_model_only=False))
    part.train()

    resumed = Trainer(
        _settings(
            tmp_path / "resumed",
            data,
            n_epoch=4,
            save_best_model_only=False,
            load=str(tmp_path / "part" / "out" / "model"),
            continue_training=True,
        )
    )
    h_res = resumed.train()

    assert len(h_res["loss"]) == 2  # epochs 2 and 3 only
    np.testing.assert_allclose(h_res["loss"], h_full["loss"][2:], rtol=1e-5)


def test_orbax_auto_resume(tmp_path):
    """auto_resume with the orbax backend restarts from the latest step."""
    import numpy as np

    from tests.test_train import _settings, _synthetic_dataset
    from page_segmentation_tpu.train.trainer import Trainer

    data = _synthetic_dataset(n_pages=3)
    out = tmp_path / "run"

    t1 = Trainer(
        _settings(out, data, n_epoch=2, save_best_model_only=False, checkpoint_backend="orbax")
    )
    t1.train()
    t1._orbax.wait()

    t2 = Trainer(
        _settings(
            out, data, n_epoch=4, save_best_model_only=False,
            checkpoint_backend="orbax", auto_resume=True,
        )
    )
    h2 = t2.train()
    assert len(h2["loss"]) == 2  # continued at epoch 2

    full = Trainer(
        _settings(tmp_path / "full", data, n_epoch=4, save_best_model_only=False)
    )
    h_full = full.train()
    np.testing.assert_allclose(h2["loss"], h_full["loss"][2:], rtol=1e-5)
