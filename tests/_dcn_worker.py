"""Worker process for the multi-host (DCN) test: one of N processes, each
with 4 virtual CPU devices, takes one data-parallel train step over the
global 8-device mesh and prints the loss."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from page_segmentation_tpu.models.fcn import FCNSkip
from page_segmentation_tpu.parallel import distributed
from page_segmentation_tpu.train.metrics import Loss
from page_segmentation_tpu.train.steps import make_step_fns


def main():
    coordinator, num_processes, process_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    distributed.initialize(coordinator, num_processes, process_id)
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes

    mesh = distributed.global_mesh()
    module = FCNSkip(n_classes=2)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    optimizer = optax.sgd(1e-2)
    opt_state = optimizer.init(params)
    train_step, _ = make_step_fns(module, optimizer, Loss.CATEGORICAL_CROSSENTROPY(), mesh=mesh)

    # deterministic global dataset; each process keeps its strided shard
    rng = np.random.RandomState(0)
    h = w = 32
    n_global = 8
    images = rng.rand(n_global, h, w, 1).astype(np.float32)
    masks = rng.randint(0, 2, (n_global, h, w)).astype(np.int32)
    rows = distributed.local_shard(list(range(n_global)))
    local = {
        "image": images[rows],
        "mask": masks[rows],
        "binary": np.ones((len(rows), h, w), np.uint8),
        "weights": np.ones((len(rows), h, w), np.float32),
    }
    batch = distributed.global_batch(mesh, local)

    # Compile BEFORE executing, then rendezvous: the Gloo CPU collectives
    # have a short fixed timeout, and on a loaded 1-core host one process
    # can hit the persistent compile cache while the other compiles for
    # minutes — a collective launched across that skew window times out.
    # AOT compile (no execution) + coordination barrier closes the window.
    step_rng = jax.random.PRNGKey(1)
    train_step.lower(params, {}, opt_state, batch, step_rng).compile()
    distributed.barrier("dcn_test_compiled")

    params, _, opt_state, metrics = train_step(params, {}, opt_state, batch, step_rng)
    loss = float(metrics["loss"])
    print(f"DCN_LOSS {process_id} {loss:.8f}", flush=True)

    # Trainer-level wiring: distributed=True shards the dataset per
    # process and assembles global batches internally
    import tempfile

    from page_segmentation_tpu.core.colors import ColorMap
    from page_segmentation_tpu.data.dataset import Dataset, SingleData
    from page_segmentation_tpu.train.metrics import Monitor
    from page_segmentation_tpu.train.trainer import Trainer, TrainSettings

    cmap = ColorMap({"(255, 255, 255)": (0, "background"), "(255, 0, 0)": (1, "text")})

    def make_pages(count, seed_offset=0):
        pages = []
        for i in range(count):
            mask = np.zeros((h, w), np.uint8)
            mask[8:24, 8:24] = 1
            image = np.where(mask == 1, 200, 10 + i + seed_offset).astype(np.uint8)
            pages.append(SingleData(image=image, binary=(mask == 1).astype(np.uint8), mask=mask))
        return pages

    # 9 pages across 2 processes: unequal strided shards (5 vs 4) exercise
    # the lockstep machinery (shard wrap + ragged-batch padding); the
    # validation set rides the eval path through global batches
    data = Dataset(make_pages(9), cmap)
    val = Dataset(make_pages(2, seed_offset=50), cmap)
    trainer = Trainer(
        TrainSettings(
            n_epoch=1, n_classes=2, l_rate=1e-3, train_data=data,
            validation_data=val, display=10,
            output_dir=tempfile.mkdtemp(), threads=1, monitor=Monitor.LOSS,
            early_stopping_max_performance_drops=0, reduce_lr_on_plateau=False,
            batch_size=4, distributed=True,
        )
    )
    assert len(trainer.settings.train_data) == 5  # ceil(9 / 2), wrapped
    # enter the trainer together so its internal compiles start in lockstep
    # (shared persistent cache + same entry point -> minimal compile skew
    # when the first collective runs)
    distributed.barrier("dcn_test_trainer_start")
    history = trainer.train()
    assert np.isfinite(history["val_loss"][0])
    print(f"DCN_TRAINER_LOSS {process_id} {history['loss'][0]:.8f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
