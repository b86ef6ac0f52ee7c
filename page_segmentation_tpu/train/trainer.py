"""Training orchestration.

Capability parity with reference trainer.py (TrainSettings ~35 fields,
AugmentationSettings, Trainer with baseline computation, train, eval) and
the reference training loop in network.py:167-242 (checkpoint-best /
early-stop / reduce-LR-on-plateau / progress callback / per-epoch
validation), redesigned TPU-first:

* the whole train step is one XLA program (train/steps.py), optionally
  shard_map'ed over a device mesh (data-parallel, psum grads over ICI);
* pages are padded to bucketed static shapes with a pixel-weight map so
  padded pixels never contribute to loss/metrics — numerically equal to
  the reference's in-graph pad/crop with batch-of-1;
* the LR schedule is driven through optax.inject_hyperparams so plateau
  reductions mutate one scalar, not the compiled program.
"""
from __future__ import annotations

import logging
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.augment import augment_triple, sample_affine_params
from ..data.dataset import Dataset, entry_shape as _entry_shape, materialize as _materialize
from ..models.registry import Architecture, Optimizers
from ..ops.pad import bucket_shape, pad_to
from .callbacks import ModelDiagnoser, ScalarLogger, TrainProgressCallback
from .checkpoint import save_checkpoint
from .metrics import Loss, Monitor

logger = logging.getLogger(__name__)


class AugmentationSettings(NamedTuple):
    """Field-parity with reference trainer.py:13-56."""

    rotation_range: float = 2.5
    width_shift_range: float = 0.025
    height_shift_range: float = 0.025
    shear_range: float = 0.00
    zoom_range: Sequence[float] = (0.95, 1.05)
    horizontal_flip: bool = False
    vertical_flip: bool = False
    brightness_range: Optional[List[float]] = None

    image_fill_mode: str = "nearest"
    binary_fill_mode: str = "nearest"
    mask_fill_mode: str = "nearest"
    image_cval: int = 0
    binary_cval: int = 0
    mask_cval: int = 0


class TrainSettings(NamedTuple):
    """Field-parity with reference trainer.py:59-106 + TPU-native extras."""

    n_epoch: int
    n_classes: int
    l_rate: float
    train_data: Dataset
    validation_data: Optional[Dataset]
    display: int
    output_dir: str
    threads: int

    data_augmentation: bool = False
    data_augmentation_settings: AugmentationSettings = AugmentationSettings()

    early_stopping_max_performance_drops: int = 10
    early_stopping_restore_best_weights: bool = True
    early_stopping_min_delta: float = 0.0

    reduce_lr_on_plateau: bool = True
    reduce_lr_plateau_factor: float = 0.5
    reduce_lr_min_lr: float = 0.000001

    model_name: str = "model"
    model_suffix: str = ""  # native checkpoints are directories
    save_best_model_only: bool = True
    save_weights_only: bool = False

    architecture: Architecture = Architecture.FCN_SKIP
    loss: Loss = Loss.CATEGORICAL_CROSSENTROPY
    monitor: Monitor = Monitor.VAL_LOSS
    optimizer: Optimizers = Optimizers.ADAM

    optimizer_norm_clipping: bool = True
    optimizer_norm_clip_value: float = 1.0
    optimizer_clipping: bool = False
    optimizer_clip_value: float = 1.0
    evaluation_data: Optional[Dataset] = None

    load: Optional[str] = None

    continue_training: bool = False
    compute_baseline: bool = False
    foreground_masks: bool = False
    tensorboard: bool = False  # diagnostics images are always PNG-backed

    image_dimension: int = 1
    gpu_allow_growth: bool = False  # accepted for parity; meaningless on TPU

    # TPU-native extras
    batch_size: int = 1
    bucket_granularity: int = 1
    compute_dtype: str = "float32"
    n_devices: Optional[int] = None  # data-parallel mesh size (None = single)
    seed: int = 0
    checkpoint_backend: str = "msgpack"  # or "orbax" (async, versioned)
    device_augmentation: bool = False  # fused on-TPU affine (perf mode)
    remat: bool = False  # activation rematerialization (memory for FLOPs)
    auto_resume: bool = False  # orbax backend: continue from the latest step
    # keras-applications backbone .h5 to fine-tune from (reference gets
    # imagenet weights inside model construction; here the file is supplied)
    pretrained_encoder: Optional[str] = None
    # multi-host (DCN) training: mesh over every process's devices; call
    # parallel.distributed.initialize() before constructing the Trainer
    distributed: bool = False
    # ship uint8 pixels/masks + valid dims and normalize on device (~4x
    # fewer host->device bytes per step); disable for the float layout
    compact_transfer: bool = True
    # also write the reference's checkpoint artifact — a Keras-legacy
    # <model_name>.h5 (reference network.py:177-183 writes .h5 for every
    # architecture) — each time the native checkpoint is saved
    export_h5: bool = False
    # gradient accumulation: apply the optimizer once every k steps on the
    # equal-weight mean of the k micro-batch gradients (large effective
    # batch without the HBM footprint; full-res pages at batch 1 still get
    # batch-k statistics).  1 = off
    grad_accum: int = 1
    # failure detection: when > 0, a step whose loss or gradients are
    # non-finite leaves params/opt-state/BN stats untouched (the update is
    # skipped on device, no host round-trip) and training aborts — after
    # saving nothing new — once this many *consecutive* steps are
    # non-finite.  0 = off (a NaN silently poisons Adam's moments, the
    # reference's Keras behavior)
    skip_nonfinite: int = 0
    # learning-rate schedule: "constant" (default; ReduceLROnPlateau may
    # adjust it, the reference behavior) or "cosine" (optax
    # warmup_cosine_decay over the run, per-step, tracked inside the
    # optimizer state so resume continues at the right point).  A
    # non-constant schedule supersedes reduce_lr_on_plateau.
    lr_schedule: str = "constant"
    lr_warmup_steps: int = 0  # cosine: linear warmup from 0 to l_rate
    # cosine: total decay steps; None = ceil(pages/batch) * n_epoch
    lr_decay_steps: Optional[int] = None
    lr_min_fraction: float = 0.0  # cosine: final lr = l_rate * fraction
    # class-balanced page sampling: redraw each training epoch's page
    # list (same length, with replacement) with pages weighted by how
    # over-represented their rarest class is globally, so minority-class
    # pixels (e.g. the ~4%-of-pixels image class) stop being swamped by
    # background/text gradients.  Off = the reference's uniform epoch
    # (every page exactly once).  Needs eager-loaded masks.
    balanced_sampling: bool = False
    # sampling temperature: draw probability = (1-s)*uniform + s*balanced.
    # Full-strength inverse-frequency (s=1) let the minority-heavy pages
    # dominate epochs and starved the majority classes (val loss never
    # recovered, early stop at ~epoch 30); 0.5 keeps every page in play
    balanced_sampling_strength: float = 0.5
    # per-class LOSS weighting: pixel loss scales by
    # corpus_freq(class)^(-beta), normalized to mean pixel weight 1 over
    # the train corpus.  0 = off (exact pre-knob programs); 0.5 = tempered
    # inverse frequency; 1 = full inverse frequency.  Needs eager masks.
    class_weighting: float = 0.0


def _weighted_means(weighted_metrics) -> dict:
    """Mean of per-batch metric dicts weighted by batch page count."""
    total = float(sum(n for n, _ in weighted_metrics))
    return {
        k: float(sum(n * float(m[k]) for n, m in weighted_metrics)) / total
        for k in weighted_metrics[0][1]
    }


class _NullLogger:
    """Scalar-logger stand-in for non-writer processes in multi-host runs."""

    def log(self, **record) -> None:
        pass

    def close(self) -> None:
        pass


class Trainer:
    def __init__(self, settings: TrainSettings):
        self.settings = settings
        s = settings
        self._class_weight_cache = {}

        dtype = jnp.bfloat16 if s.compute_dtype == "bfloat16" else jnp.float32
        self.module = s.architecture.model(s.n_classes, dtype=dtype)
        self.preprocess, self.rgb = s.architecture.preprocess()
        self.loss_fn = s.loss()

        def build(learning_rate):
            return s.optimizer.make(
                learning_rate,
                norm_clipping=s.optimizer_norm_clipping,
                norm_clip_value=s.optimizer_norm_clip_value,
                value_clipping=s.optimizer_clipping,
                clip_value=s.optimizer_clip_value,
            )

        if s.lr_schedule == "constant":
            lr_arg = s.l_rate
        elif s.lr_schedule == "cosine":
            import math

            # the schedule advances once per APPLIED update: with
            # grad_accum, k micro-steps produce one update, so the default
            # horizon converts micro-steps to updates (an explicit
            # lr_decay_steps is already in applied-update units)
            total = s.lr_decay_steps or max(
                1,
                math.ceil(len(s.train_data) / max(1, s.batch_size)) * s.n_epoch
                // max(1, s.grad_accum),
            )
            # a schedule passed to inject_hyperparams evaluates per applied
            # update (its count lives in the optimizer state, so exact
            # resume continues the curve; with grad_accum, per *applied*
            # step, not per micro-step)
            lr_arg = optax.warmup_cosine_decay_schedule(
                init_value=0.0 if s.lr_warmup_steps else s.l_rate,
                peak_value=s.l_rate,
                warmup_steps=s.lr_warmup_steps,
                decay_steps=max(total, s.lr_warmup_steps + 1),
                end_value=s.l_rate * s.lr_min_fraction,
            )
        else:
            raise ValueError(f"unknown lr_schedule '{s.lr_schedule}'")
        self.optimizer = optax.inject_hyperparams(build)(learning_rate=lr_arg)
        if s.grad_accum > 1:
            # MultiSteps accumulates k micro-gradients and applies their
            # equal-weight mean once; the inner inject_hyperparams state
            # (plateau LR) lives at opt_state.inner_opt_state (see _set_lr)
            self.optimizer = optax.MultiSteps(self.optimizer, every_k_schedule=s.grad_accum)

        # params: fresh init or load/continue (reference network.py:76-107)
        from ..inference.classifier import PixelClassifier

        try:
            classifier = PixelClassifier(
                n_classes=s.n_classes,
                architecture=s.architecture,
                model_path=s.load,
                compute_dtype=dtype,
                seed=s.seed,
            )
        except Exception:
            # reference behavior (network.py:75-89): a failed load falls
            # back to a fresh build unless the user asked to continue
            if s.continue_training:
                raise
            logger.warning(f"Could not load model from {s.load}; training from fresh init")
            classifier = PixelClassifier(
                n_classes=s.n_classes,
                architecture=s.architecture,
                compute_dtype=dtype,
                seed=s.seed,
            )
        self.params = classifier.params
        self.model_state = classifier.model_state  # batch_stats for BN models

        if s.pretrained_encoder:
            from ..models.h5_import import load_encoder_into

            variables = load_encoder_into(
                {"params": self.params, **self.model_state}, s.architecture, s.pretrained_encoder
            )
            self.params = variables["params"]
            self.model_state = {k: v for k, v in variables.items() if k != "params"}
            logger.info(f"Loaded pretrained encoder from {s.pretrained_encoder}")

        self.opt_state = self.optimizer.init(self.params)

        # resume: restore optimizer moments + loop counters alongside the
        # weights (reference network.py:76-107: Keras load_model restores
        # optimizer state on continue_training; weights-only restarts the
        # Adam moments and plateau bookkeeping silently)
        self._resume_meta: Optional[dict] = None
        if s.continue_training and s.load:
            from .checkpoint import load_meta, load_opt_state

            restored_opt = load_opt_state(s.load, template=self.opt_state)
            if restored_opt is not None:
                self.opt_state = restored_opt
                meta = load_meta(s.load)
                if meta.get("epoch") is not None:
                    self._resume_meta = meta
                logger.info(
                    f"Resumed optimizer state from {s.load} "
                    f"(epoch {meta.get('epoch')}, lr {meta.get('lr', meta.get('l_rate'))})"
                )

        if s.auto_resume and s.checkpoint_backend == "orbax":
            self._try_orbax_resume()

        self.mesh = None
        self._multi_host = False
        self._forced_bucket = None
        if s.distributed:
            # multi-host (DCN) mode: jax.distributed.initialize must have
            # run (parallel/distributed.initialize); the mesh spans every
            # chip of every host, each process loads only its dataset
            # shard, and batches are assembled with
            # make_array_from_process_local_data.  Contract: every process
            # loads the SAME dataset (the sharding happens here), so the
            # batch count and bucket shape below agree without any
            # cross-host negotiation.
            from ..parallel import distributed

            self.mesh = distributed.global_mesh()
            self._multi_host = jax.process_count() > 1
            if self._multi_host:
                import math

                from ..data.dataset import Dataset

                # lockstep requirements: every process must take the same
                # number of identically-shaped steps per epoch, or the
                # psums deadlock.  (a) one bucket shape for the whole
                # (global) dataset; (b) equal shard lengths — short shards
                # wrap around their own pages (at most process_count - 1
                # duplicates per epoch globally)
                self._forced_bucket = (
                    max(
                        bucket_shape(_entry_shape(d), s.architecture.stride_factor,
                                     s.bucket_granularity)[0]
                        for d in s.train_data.data
                    ),
                    max(
                        bucket_shape(_entry_shape(d), s.architecture.stride_factor,
                                     s.bucket_granularity)[1]
                        for d in s.train_data.data
                    ),
                )
                shard = distributed.local_shard(s.train_data.data)
                if not shard:
                    raise Exception(
                        f"dataset has {len(s.train_data.data)} pages for "
                        f"{jax.process_count()} processes; every process needs at least one"
                    )
                target_len = math.ceil(len(s.train_data.data) / jax.process_count())
                while len(shard) < target_len:  # strided shards differ by <= 1
                    shard.append(shard[0])
                self.settings = s = s._replace(
                    train_data=Dataset(shard, s.train_data.color_map)
                )
        elif s.n_devices and s.n_devices > 1:
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh(s.n_devices)

        # device augmentation consumes float images on device; the compact
        # uint8 layout applies to the host-augmentation path
        self._compact = s.compact_transfer and not (s.data_augmentation and s.device_augmentation)

        from .steps import make_step_fns

        class_weights = None
        if s.class_weighting:
            freq = self._corpus_class_freq(s.train_data.data)
            raw = np.power(np.maximum(freq, 1e-9), -float(s.class_weighting))
            # normalize to mean pixel weight 1 over the train corpus so the
            # loss scale (and the lr that suits it) is comparable to CCE
            class_weights = (raw / max(float((freq * raw).sum()), 1e-9)
                             ).astype(np.float32)
            logger.info(f"class weights (beta={s.class_weighting}): "
                        f"{np.round(class_weights, 3).tolist()}")
        # single-device batches carry the weight vector (one compiled
        # program serves every beta; the tunneled remote compile costs
        # minutes); mesh batches can't — _pad_for_mesh/shard_batch treat
        # every key as batch-dim sharded — so there it bakes as a constant
        self._class_weights = class_weights

        self._train_step, self._eval_step = make_step_fns(
            self.module, self.optimizer, self.loss_fn, mesh=self.mesh, remat=s.remat,
            device_preprocess=s.architecture.device_preprocess(),
            skip_nonfinite=s.skip_nonfinite > 0,
            class_weights=class_weights,
        )

        if len(s.train_data) == 0 and s.n_epoch > 0:
            raise Exception("No training files specified. Maybe set n_iter=0")

        if s.compute_baseline:
            self._log_baseline()

    # ------------------------------------------------------------- resume
    def _try_orbax_resume(self) -> None:
        """Continue from the newest Orbax step if the directory has one:
        params, batch_stats, optimizer state, and the loop counters (epoch,
        lr, best monitor value, early-stop wait) all come back."""
        import os

        from flax import serialization

        from .checkpoint import OrbaxCheckpointer

        s = self.settings
        directory = os.path.join(s.output_dir, s.model_name + "_orbax")
        if not os.path.isdir(directory):
            return
        self._orbax = OrbaxCheckpointer(directory)
        restored = self._orbax.restore()
        if restored is None:
            return
        step, state, meta = restored
        variables = state["variables"]
        self.params = variables["params"]
        self.model_state = {k: v for k, v in variables.items() if k != "params"}
        if "opt_state" in state:
            self.opt_state = serialization.from_state_dict(self.opt_state, state["opt_state"])
        self._resume_meta = dict(meta or {})
        self._resume_meta.setdefault("epoch", step)
        logger.info(f"Auto-resumed from orbax step {step} in {directory}")

    # ------------------------------------------------------------- baseline
    def _log_baseline(self):
        """Majority-class accuracy floor (reference trainer.py:135-143)."""
        s = self.settings

        if any(d.mask is None and d.loader is not None for d in s.train_data.data):
            # streaming data: one pass in threaded chunks of transient
            # copies (O(chunk) memory; parallel decode on multi-core hosts)
            counts = np.zeros(s.n_classes, np.int64)
            total = 0
            entries = s.train_data.data
            for start in range(0, len(entries), 16):
                for d in _materialize(entries[start : start + 16]):
                    counts += np.bincount(d.mask.ravel(), minlength=s.n_classes)[: s.n_classes]
                    total += d.mask.size
            percentages = list(counts / max(total, 1))
            logging.info(f"Label percentage: {list(zip(range(s.n_classes), percentages))}")
            logging.info(f"Baseline: {max(percentages)}")
            self.baseline = max(percentages)
            return

        def label_percentage(label):
            total = np.sum([d.mask.shape[0] * d.mask.shape[1] for d in s.train_data.data])
            return np.sum([np.sum(d.mask == label) for d in s.train_data.data]) / total

        logging.info(f"Computing label percentage for {len(s.train_data.data)} files.")
        percentages = [label_percentage(l) for l in range(s.n_classes)]
        logging.info(f"Label percentage: {list(zip(range(s.n_classes), percentages))}")
        logging.info(f"Baseline: {max(percentages)}")
        self.baseline = max(percentages)

    # --------------------------------------------------------------- batches
    def _make_batch(self, samples, augment: bool, rng: Optional[np.random.Generator]):
        s = self.settings
        samples = _materialize(samples)  # streaming entries load here (prefetch thread)
        # multi-host lockstep: all processes pad to the same (global max)
        # bucket regardless of their local pages
        target = self._forced_bucket or (0, 0)
        prepared = []
        for d in samples:
            image, binary, mask = d.image, d.binary, d.mask
            if self.rgb and (image.ndim == 2):
                image = np.stack([image] * 3, axis=-1)
            if binary is None:
                binary = np.full(image.shape[:2], 1, dtype=np.uint8)
            if s.foreground_masks:
                mask = mask.copy()
                mask[binary != 1] = 0
            if augment:
                params = sample_affine_params(
                    rng,
                    image.shape[:2],
                    rotation_range=s.data_augmentation_settings.rotation_range,
                    width_shift_range=s.data_augmentation_settings.width_shift_range,
                    height_shift_range=s.data_augmentation_settings.height_shift_range,
                    shear_range=s.data_augmentation_settings.shear_range,
                    zoom_range=tuple(s.data_augmentation_settings.zoom_range),
                    horizontal_flip=s.data_augmentation_settings.horizontal_flip,
                    vertical_flip=s.data_augmentation_settings.vertical_flip,
                    brightness_range=s.data_augmentation_settings.brightness_range,
                )
                image, binary, mask = augment_triple(
                    image, binary, mask, params, s.data_augmentation_settings
                )
            if self._compact:
                # compact transfer: raw uint8 pixels ship over the link,
                # normalization + the weights map materialize on device
                # inside the step (train/steps.py unpack) — ~4x fewer bytes
                image = np.clip(np.round(np.asarray(image, np.float32)), 0, 255).astype(np.uint8)
            else:
                image = np.asarray(self.preprocess(np.asarray(image, np.float32)), np.float32)
            if image.ndim == 2:
                image = image[..., None]
            prepared.append((image, binary, mask))
            shape = bucket_shape(
                image.shape[:2], s.architecture.stride_factor, s.bucket_granularity
            )
            target = (max(target[0], shape[0]), max(target[1], shape[1]))

        n = len(prepared)
        c = prepared[0][0].shape[-1]
        if self._compact:
            batch = {
                "image": np.zeros((n,) + target + (c,), np.uint8),
                "binary": np.zeros((n,) + target, np.uint8),
                "mask": np.zeros((n,) + target, np.uint8),
                "dims": np.zeros((n, 2), np.int32),
            }
            for i, (image, binary, mask) in enumerate(prepared):
                batch["image"][i] = pad_to(image, target)
                batch["binary"][i] = pad_to(binary.astype(np.uint8), target)
                batch["mask"][i] = pad_to(mask.astype(np.uint8), target)
                batch["dims"][i] = image.shape[:2]
            if self._class_weights is not None and self.mesh is None:
                batch["class_weights"] = self._class_weights
            return batch
        batch = {
            "image": np.zeros((n,) + target + (c,), np.float32),
            "binary": np.zeros((n,) + target, np.uint8),
            "mask": np.zeros((n,) + target, np.int32),
            "weights": np.zeros((n,) + target, np.float32),
        }
        for i, (image, binary, mask) in enumerate(prepared):
            h, w = image.shape[:2]
            batch["image"][i] = pad_to(image, target)
            batch["binary"][i] = pad_to(binary.astype(np.uint8), target)
            batch["mask"][i] = pad_to(mask.astype(np.int32), target)
            batch["weights"][i, :h, :w] = 1.0
        if self._class_weights is not None and self.mesh is None:
            batch["class_weights"] = self._class_weights
        return batch

    def _corpus_class_freq(self, data) -> "np.ndarray":
        """(n_classes,) pixel frequency over the (eager) train masks."""
        n = self.settings.n_classes
        corpus = np.zeros(n, np.float64)
        for d in data:
            if d.mask is None:
                raise ValueError(
                    "class balancing needs eager-loaded masks "
                    "(streaming/lazy datasets keep pixels on disk)"
                )
            corpus += np.bincount(d.mask.reshape(-1), minlength=n)[:n]
        return corpus / max(1.0, corpus.sum())

    def _page_class_weights(self, data) -> "np.ndarray":
        """Per-page sampling probability: the balanced term is the max
        over classes on the page of (page's pixel fraction of c) /
        (corpus pixel fraction of c) — a page that is 30% image-class in
        a 4%-image corpus scores ~7.5, an all-background page ~1 — then
        TEMPERED against uniform by balanced_sampling_strength (full-
        strength starved the majority classes; see TrainSettings).
        Cached per dataset identity (masks are immutable during train)."""
        key = id(data[0]) if data else None
        cached = self._class_weight_cache.get(key)
        if cached is not None and len(cached) == len(data):
            return cached
        n = self.settings.n_classes
        corpus = self._corpus_class_freq(data)
        per_page = np.zeros((len(data), n), np.float64)
        for i, d in enumerate(data):
            counts = np.bincount(d.mask.reshape(-1), minlength=n)[:n]
            per_page[i] = counts / max(1, counts.sum())
        ratios = per_page / np.maximum(corpus, 1e-9)[None, :]
        balanced = np.maximum(ratios.max(axis=1), 1e-3)
        balanced = balanced / balanced.sum()
        s = float(np.clip(self.settings.balanced_sampling_strength, 0.0, 1.0))
        weights = (1.0 - s) / len(data) + s * balanced
        weights = weights / weights.sum()
        self._class_weight_cache = {key: weights}
        return weights

    def _balanced_resample(self, data, rng):
        """Redraw an epoch-sized page list (with replacement) under the
        class-balance weights.  Duplicated pages diverge under
        augmentation (per-sample transform draws in _make_batch)."""
        weights = self._page_class_weights(data)
        idx = rng.choice(len(data), size=len(data), replace=True, p=weights)
        return [data[i] for i in idx]

    def _bucketed_batches(self, dataset: Dataset, batch_size: int, shuffle_rng=None):
        """Group pages by bucket shape, yield same-bucket batches.

        Multi-host mode forces one bucket (the global max): every process
        must take the same number of identically-shaped steps."""
        s = self.settings
        data = dataset.data
        # only training epochs resample (they pass a shuffle rng); eval
        # paths must see every page exactly once
        if s.balanced_sampling and shuffle_rng is not None:
            data = self._balanced_resample(data, shuffle_rng)
        groups = {}
        for d in data:
            shape = self._forced_bucket or bucket_shape(
                _entry_shape(d), s.architecture.stride_factor, s.bucket_granularity
            )
            groups.setdefault(shape, []).append(d)
        order = []
        for shape, members in groups.items():
            if shuffle_rng is not None:
                shuffle_rng.shuffle(members)
            for start in range(0, len(members), batch_size):
                order.append(members[start : start + batch_size])
        if shuffle_rng is not None:
            shuffle_rng.shuffle(order)
        return order

    # ----------------------------------------------------------------- train
    def train(self, callback: Optional[TrainProgressCallback] = None) -> dict:
        s = self.settings
        import os

        os.makedirs(s.output_dir, exist_ok=True)
        # in multi-host mode only process 0 writes shared files (scalars,
        # diagnostics, checkpoints); concurrent writers corrupt them
        writer_process = not self._multi_host or jax.process_index() == 0
        scalars = ScalarLogger(s.output_dir) if writer_process else _NullLogger()
        diagnoser = (
            ModelDiagnoser(os.path.join(s.output_dir, "diagnostics"), s.validation_data.color_map)
            if writer_process and s.tensorboard and s.validation_data is not None
            else None
        )

        if callback:
            callback.init(
                s.n_epoch * len(s.train_data.data), s.early_stopping_max_performance_drops
            )

        monitor = s.monitor
        best_value = np.inf if monitor.mode == "min" else -np.inf
        best_params = None
        wait = 0
        lr = float(s.l_rate)
        history = {"loss": [], "val_loss": [], "lr": []}
        stop = False
        global_step = 0
        start_epoch = 0
        nonfinite_streak = 0

        if self._resume_meta:
            meta = self._resume_meta
            start_epoch = int(meta["epoch"]) + 1
            lr = float(meta.get("lr", lr))
            if s.lr_schedule == "constant":
                # schedules track their own step count inside the restored
                # optimizer state; only the plateau-adjusted constant lr is
                # a loop-level value to reinstate
                self._set_lr(lr)
            if meta.get("best_value") is not None:
                best_value = float(meta["best_value"])
            wait = int(meta.get("wait", 0))
            global_step = int(meta.get("global_step", 0))
            logger.info(
                f"Resuming at epoch {start_epoch} (lr={lr}, best={best_value}, wait={wait})"
            )

        from concurrent.futures import ThreadPoolExecutor

        host_augment = s.data_augmentation and not s.device_augmentation

        def build_batch(samples):
            # placement happens here, in the prefetch thread, so the
            # host->device transfer of batch k+1 overlaps step k
            return self._place_batch(self._make_batch(samples, augment=host_augment, rng=rng))

        for epoch in range(start_epoch, s.n_epoch):
            # per-epoch derived RNG streams: a resumed run at epoch k draws
            # exactly what the uninterrupted run would have drawn
            rng = np.random.default_rng([s.seed, epoch])
            dropout_key = jax.random.fold_in(jax.random.PRNGKey(s.seed), epoch)
            epoch_metrics = []
            batches = self._bucketed_batches(s.train_data, s.batch_size, shuffle_rng=rng)
            # host-prefetch pipeline: augmentation/padding of the next batch
            # overlaps the device step of the current one (replaces the
            # reference's synchronous per-sample generator, network.py:127-165)
            with ThreadPoolExecutor(max_workers=1) as prefetch:
                next_batch = prefetch.submit(build_batch, batches[0])
                for index in range(len(batches)):
                    batch = next_batch.result()
                    if index + 1 < len(batches):
                        next_batch = prefetch.submit(build_batch, batches[index + 1])
                    dropout_key, step_key = jax.random.split(dropout_key)
                    if s.data_augmentation and s.device_augmentation:
                        from ..data.augment_device import (
                            DeviceAugmentConfig,
                            augment_batch_on_device,
                        )

                        aug = s.data_augmentation_settings
                        cfg = DeviceAugmentConfig(
                            rotation_range=aug.rotation_range,
                            width_shift_range=aug.width_shift_range,
                            height_shift_range=aug.height_shift_range,
                            shear_range=aug.shear_range,
                            zoom_min=aug.zoom_range[0],
                            zoom_max=aug.zoom_range[1],
                            horizontal_flip=aug.horizontal_flip,
                            vertical_flip=aug.vertical_flip,
                        )
                        dropout_key, aug_key = jax.random.split(dropout_key)
                        image_a, binary_a, mask_a = augment_batch_on_device(
                            aug_key,
                            jnp.asarray(batch["image"]),
                            jnp.asarray(batch["binary"]),
                            jnp.asarray(batch["mask"]),
                            cfg,
                        )
                        batch = {**batch, "image": image_a, "binary": binary_a, "mask": mask_a}
                    self.params, self.model_state, self.opt_state, step_metrics = self._train_step(
                        self.params, self.model_state, self.opt_state, batch, step_key
                    )
                    skipped_step = False
                    if s.skip_nonfinite:
                        if float(step_metrics["nonfinite"]) > 0:
                            skipped_step = True
                            nonfinite_streak += 1
                            logger.warning(
                                f"step {global_step}: non-finite loss/grads — update "
                                f"skipped ({nonfinite_streak}/{s.skip_nonfinite} consecutive)"
                            )
                            if nonfinite_streak >= s.skip_nonfinite:
                                raise RuntimeError(
                                    f"training diverged: {nonfinite_streak} consecutive "
                                    "non-finite steps (params kept at the last finite state; "
                                    "lower l_rate or enable optimizer clipping)"
                                )
                        else:
                            nonfinite_streak = 0
                    if not skipped_step:
                        # a skipped step's metrics are NaN — averaging them
                        # in would poison the epoch means, the monitor, and
                        # the history JSON
                        epoch_metrics.append((len(batches[index]), step_metrics))
                    if callback and not skipped_step:
                        callback.update_loss(
                            global_step,
                            float(step_metrics["loss"]),
                            float(step_metrics["accuracy"]),
                        )
                    global_step += 1

            # page-count-weighted epoch means: batches differ in size
            # (ragged bucket tails), so an equal-weight mean over batches
            # would over-weight small ones
            if not epoch_metrics:
                raise RuntimeError(
                    "training diverged: every step this epoch was non-finite "
                    "(updates skipped; lower l_rate or enable clipping)"
                )
            train_avg = _weighted_means(epoch_metrics)
            if s.lr_schedule != "constant":
                lr = self._current_lr()  # the schedule's value after this epoch
            record = {"epoch": epoch, "lr": lr, **{k: v for k, v in train_avg.items()}}

            val_avg = None
            if s.validation_data is not None and len(s.validation_data) > 0:
                val_avg = self._run_eval(s.validation_data)
                record.update({f"val_{k}": v for k, v in val_avg.items()})
                if diagnoser is not None:
                    diagnoser.diagnose(epoch, self._diagnostic_samples(s.validation_data))

            scalars.log(**record)
            history["loss"].append(train_avg["loss"])
            history["lr"].append(lr)
            if val_avg:
                history["val_loss"].append(val_avg["loss"])
            logger.info(f"epoch {epoch}: {record}")

            # ---- monitor / checkpoint / early stop / plateau
            current = self._monitor_value(monitor, train_avg, val_avg)
            improved = (
                current < best_value - s.early_stopping_min_delta
                if monitor.mode == "min"
                else current > best_value + s.early_stopping_min_delta
            )
            if improved:
                best_value = current
                wait = 0
                best_params = jax.device_get((self.params, self.model_state))
                if s.save_best_model_only:
                    self._save(best_value, epoch, lr=lr, best_value=best_value, wait=wait, global_step=global_step)
                if callback:
                    callback.next_best(global_step, best_value, wait)
            else:
                wait += 1
                if s.early_stopping_max_performance_drops and wait >= s.early_stopping_max_performance_drops:
                    logger.info(f"Early stopping at epoch {epoch} (wait={wait})")
                    stop = True
                if (
                    s.reduce_lr_on_plateau
                    and s.lr_schedule == "constant"  # a schedule supersedes plateau
                    and wait > 0
                    and wait % max(int(s.early_stopping_max_performance_drops / 2), 1) == 0
                ):
                    new_lr = max(lr * s.reduce_lr_plateau_factor, s.reduce_lr_min_lr)
                    if new_lr < lr:
                        lr = new_lr
                        self._set_lr(lr)
                        logger.info(f"ReduceLROnPlateau: lr -> {lr}")
            if not s.save_best_model_only:
                self._save(current, epoch, lr=lr, best_value=best_value, wait=wait, global_step=global_step)
            if stop:
                break

        if s.early_stopping_restore_best_weights and best_params is not None:
            self.params, self.model_state = best_params
        scalars.close()
        return history

    # ------------------------------------------------------------------ eval
    def eval(self) -> Optional[dict]:
        s = self.settings
        if s.evaluation_data is None:
            logger.info("Evaluation Dataset in Trainsetting not set! ")
            return None
        if len(s.evaluation_data) == 0:
            logger.info("Empty Dataset. Skipping Evaluation")
            return None
        metrics = self._run_eval(s.evaluation_data)
        logger.info(f"eval: {metrics}")
        return metrics

    def _run_eval(self, dataset: Dataset) -> dict:
        # multi-host note: every process holds the full validation set, so
        # each page appears process_count times in the global eval batch —
        # harmless, the metrics are weighted means (duplicates scale the
        # numerator and denominator together)
        results = []
        for samples in self._bucketed_batches(dataset, self.settings.batch_size):
            batch = self._place_batch(self._make_batch(samples, augment=False, rng=None))
            results.append((len(samples), self._eval_step(self.params, self.model_state, batch)))
        return _weighted_means(results)

    # --------------------------------------------------------------- helpers
    def _pad_for_mesh(self, batch, n_dev: Optional[int] = None):
        """Pad the batch dim to a multiple of ``n_dev`` (default: the mesh
        size); zero rows carry weight 0, so they are no-ops in the
        weighted objectives."""
        n_dev = n_dev or self.mesh.devices.size
        n = batch["image"].shape[0]
        if n % n_dev == 0:
            return batch
        pad_n = n_dev - n % n_dev
        for key, arr in batch.items():
            batch[key] = np.concatenate([arr, np.zeros((pad_n,) + arr.shape[1:], arr.dtype)])
        return batch

    def _place_batch(self, batch):
        """Final placement of a host batch for the configured topology."""
        if self._multi_host:
            from ..parallel import distributed

            # local rows must tile the local devices; padded rows weigh 0
            local = self._pad_for_mesh(batch, n_dev=len(jax.local_devices()))
            return distributed.global_batch(self.mesh, local)
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch

            return shard_batch(self.mesh, self._pad_for_mesh(batch))
        return jax.tree_util.tree_map(jax.device_put, batch)

    def _monitor_value(self, monitor: Monitor, train_avg: dict, val_avg: Optional[dict]) -> float:
        key = monitor.value
        if monitor.is_validation:
            if val_avg is None:
                return train_avg[key.replace("val_", "")]
            return val_avg[key.replace("val_", "")]
        return train_avg.get(key, train_avg["loss"])

    def _set_lr(self, lr: float) -> None:
        state = self.opt_state
        if not hasattr(state, "hyperparams"):  # optax.MultiSteps wrapper
            state = state.inner_opt_state
        state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)

    def _current_lr(self) -> float:
        state = self.opt_state
        if not hasattr(state, "hyperparams"):  # optax.MultiSteps wrapper
            state = state.inner_opt_state
        return float(state.hyperparams["learning_rate"])

    def _save(self, monitor_value: float, epoch: int, **loop_state) -> None:
        import os

        s = self.settings
        if self._multi_host and jax.process_index() != 0:
            # params/opt state are replicated; only one host may write the
            # shared checkpoint files (concurrent writes corrupt them)
            return
        meta = {
            "architecture": s.architecture.value,
            "n_classes": s.n_classes,
            "monitor": s.monitor.value,
            "monitor_value": float(monitor_value),
            "epoch": epoch,
            "l_rate": s.l_rate,
            # loop counters for exact resume: lr, best_value, wait, global_step
            **{k: (float(v) if v is not None else None) for k, v in loop_state.items()},
        }
        if s.checkpoint_backend == "orbax":
            if not hasattr(self, "_orbax"):
                from .checkpoint import OrbaxCheckpointer

                self._orbax = OrbaxCheckpointer(
                    os.path.join(s.output_dir, s.model_name + "_orbax")
                )
            self._orbax.save(
                epoch,
                {"params": self.params, **self.model_state},
                opt_state=None if s.save_weights_only else self.opt_state,
                meta=meta,
            )
        # the msgpack directory checkpoint is always written: it is the
        # portable format PixelClassifier loads (orbax adds async history)
        path = os.path.join(s.output_dir, s.model_name + s.model_suffix)
        save_checkpoint(
            path,
            {"params": self.params, **self.model_state},
            meta=meta,
            opt_state=None if s.save_weights_only else self.opt_state,
        )
        if s.export_h5:
            # the reference's interchange artifact (network.py:177-183):
            # a Keras-legacy .h5 loadable by reference-era tooling
            from ..models.h5_export import save_keras_variables

            save_keras_variables(
                os.path.join(s.output_dir, s.model_name + ".h5"),
                jax.device_get({"params": self.params, **self.model_state}),
                s.architecture,
            )

    def _diagnostic_samples(self, dataset: Dataset):
        for d in dataset.data[:10]:
            d = _materialize([d])[0]  # transient copy for streaming entries
            batch = self._make_batch([d], augment=False, rng=None)
            image = batch["image"]
            if image.dtype == np.uint8:  # compact layout: normalize here
                image = np.asarray(
                    self.preprocess(np.asarray(image, np.float32)), np.float32
                )
            logits = self.module.apply(
                {"params": self.params, **self.model_state}, image
            )
            h, w = d.image.shape[:2]
            pred = np.asarray(jnp.argmax(logits[0], -1))[:h, :w]
            yield d.image, d.binary, d.mask, pred
