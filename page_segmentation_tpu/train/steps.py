"""Jitted train / eval step factories, single-chip and mesh-parallel.

The device boundary of the reference is Keras ``model.fit`` feeding one
page per step (network.py:235-241).  Here the whole step — forward, loss,
backward, optimizer update, metrics — is one XLA program; multi-chip runs
the same program under ``shard_map`` over a ``Mesh`` with the batch split
on the ``data`` axis and gradients/metrics ``pmean``-ed over ICI.

Batches are dicts with keys:
    image   (N, H, W, C) float32 (already preprocessed)
    mask    (N, H, W)    int32
    binary  (N, H, W)    uint8   (1 = ink)
    weights (N, H, W)    float32 (0 on bucket padding)
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from . import metrics as M


def make_step_fns(
    module,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    donate: bool = True,
    remat: bool = False,
    device_preprocess: Optional[Callable] = None,
    skip_nonfinite: bool = False,
    class_weights=None,
):
    """Returns (train_step, eval_step).

    train_step(params, model_state, opt_state, batch, dropout_rng)
        -> (params, model_state, opt_state, metrics dict)
    eval_step(params, model_state, batch) -> metrics dict

    ``model_state`` carries non-param collections (batch_stats for the
    BN-bearing encoder families); pass {} for BN-free models.

    Batches may arrive in the compact-transfer layout — raw uint8 pixels,
    uint8 masks, and per-sample valid ``dims`` instead of a float weights
    map (~4x fewer host->device bytes) — in which case normalization
    (``device_preprocess``, default /255) and the weights map are
    materialized on device inside the step.

    ``class_weights`` (n_classes,) floats: per-class LOSS weighting —
    each pixel's loss contribution scales by its true class's weight
    (materialized on device as ``loss_weights`` = validity x
    class_weights[mask]).  The optimized/monitored loss becomes the
    class-weighted mean; accuracy/jaccard/dice/fgpa stay pixel-uniform.
    None = off (bitwise-identical programs to before the knob existed).
    The weight VECTOR rides in the batch (``class_weights`` key), so
    every beta shares one compiled program per bucket shape; only its
    length (n_classes) is baked.
    """
    n_cw = len(class_weights) if class_weights is not None else 0
    cw_default = (jnp.asarray(class_weights, jnp.float32)
                  if class_weights is not None else None)

    def class_weight_map(cw, mask):
        # unrolled select-sum, NOT cw[mask]: a gather indexed by an
        # (N, H, W) mask wedges/crashes the tunneled TPU worker (same
        # failure mode as take_along_axis over page-sized arrays —
        # segmentation/device_morph.py docstring); n_classes <= 19, so
        # the elementwise chain fuses into the loss anyway
        out = jnp.zeros(mask.shape, jnp.float32)
        for c in range(n_cw):
            out = out + cw[c] * (mask == c).astype(jnp.float32)
        return out

    def unpack(batch):
        if "dims" not in batch:
            if n_cw and "loss_weights" not in batch:
                batch = dict(batch)
                cw = batch.pop("class_weights", cw_default)
                lw = class_weight_map(cw, batch["mask"])
                batch["loss_weights"] = (
                    batch["weights"] * lw if "weights" in batch else lw
                )
            return batch
        image = batch["image"]
        x = image.astype(jnp.float32)
        if image.dtype == jnp.uint8:
            x = device_preprocess(x) if device_preprocess else x / 255.0
        n, h, w = image.shape[:3]
        dims = batch["dims"]  # (N, 2) int32 valid (rows, cols)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
        weights = (
            (rows < dims[:, 0, None, None]) & (cols < dims[:, 1, None, None])
        ).astype(jnp.float32)
        # the float layout pads AFTER preprocessing, so pad pixels are 0;
        # device normalization maps raw-zero padding to nonzero values for
        # the imagenet modes (-1 for tf, -mean for caffe/torch) — re-zero
        # it so both layouts (and the reference's in-graph zero pad,
        # model.py:20-26) feed identical activations near the pad boundary
        x = x * weights[..., None]
        out = {
            "image": x,
            "mask": batch["mask"].astype(jnp.int32),
            "binary": batch["binary"],
            "weights": weights,
        }
        if n_cw:
            cw = batch.get("class_weights")
            if cw is None:
                cw = cw_default
            out["loss_weights"] = weights * class_weight_map(cw, out["mask"])
        return out

    def compute_metrics(batch, logits):
        # the REPORTED/MONITORED loss stays the plain pixel-uniform
        # objective even when class_weights scale the optimized one:
        # the weighted val loss explodes on confidently-wrong rare-class
        # pixels long before accuracy peaks (observed: val_acc 0.29->0.73
        # while weighted val CE went 1.1->3.1), so selecting checkpoints
        # on it freezes "best" at epoch ~0 and restore-best then ships a
        # garbage model.  Monitoring plain val CE keeps the reference's
        # selection semantics; the weighted objective rides along as
        # loss_weighted for visibility.
        w = batch.get("weights")
        return {
            "loss": loss_fn(batch["mask"], logits, weights=w),
            "accuracy": M.accuracy(batch["mask"], logits, weights=w),
            "jacard_coef": jnp.mean(M.jacard_coef(batch["mask"], logits, weights=w)),
            "dice_coef": jnp.mean(M.dice_coef(batch["mask"], logits, weights=w)),
            "fgpa": M.fgpa(batch["mask"], logits, batch["binary"], weights=w),
        }

    # weighted pmean-style reductions: a shard that is pure mesh padding
    # (weights all 0, from Trainer._pad_for_mesh) must contribute nothing,
    # not a 0 (or a degenerate 1) at full weight.  Pixel-weighted metrics
    # reduce by weight sums — psum(shard_mean·shard_wsum)/psum(shard_wsum)
    # equals the single-device weighted mean exactly; per-page-mean metrics
    # (fgpa/jaccard/dice, which already exclude padding pages within a
    # shard via metrics.page_validity) reduce by valid-page counts.
    _PIXEL_WEIGHTED = ("loss", "accuracy")

    def reduce_metrics(step_metrics, batch):
        w = batch.get("weights")
        if w is None:
            return jax.lax.pmean(step_metrics, data_axis)
        shard_wsum = jnp.sum(w.astype(jnp.float32))
        total_wsum = jnp.maximum(jax.lax.psum(shard_wsum, data_axis), 1.0)
        shard_pages = jnp.sum(M.page_validity(w))
        total_pages = jnp.maximum(jax.lax.psum(shard_pages, data_axis), 1.0)
        return {
            k: (
                jax.lax.psum(v * shard_wsum, data_axis) / total_wsum
                if k in _PIXEL_WEIGHTED
                else jax.lax.psum(v * shard_pages, data_axis) / total_pages
            )
            for k, v in step_metrics.items()
        }

    def weight_share(batch):
        """This shard's fraction of the global weight mass.

        Scaling the *local* loss by it makes the global loss
        Σᵢ sᵢ·ℓᵢ / Σᵢ sᵢ — the single-device weighted mean — and because
        params enter shard_map replicated, reverse-mode AD inserts the
        cross-shard psum on their cotangent automatically, so the implicit
        gradient is exactly the single-device gradient.  Shards that are
        pure mesh padding (weight 0) contribute nothing.
        """
        w = batch.get("loss_weights", batch.get("weights"))
        if w is None:
            return 1.0 / jax.lax.psum(jnp.float32(1.0), data_axis)
        shard_wsum = jnp.sum(w.astype(jnp.float32))
        total_wsum = jnp.maximum(jax.lax.psum(shard_wsum, data_axis), 1.0)
        return shard_wsum / total_wsum

    def train_core(params, model_state, opt_state, batch, dropout_rng):
        batch = unpack(batch)
        mutable = list(model_state.keys())

        def forward(p, image):
            variables = {"params": p, **model_state}
            if mutable:
                return module.apply(
                    variables, image, train=True,
                    rngs={"dropout": dropout_rng}, mutable=mutable,
                )
            return (
                module.apply(variables, image, train=True, rngs={"dropout": dropout_rng}),
                model_state,
            )

        if remat:
            # full-activation rematerialization: the backward pass recomputes
            # the forward instead of keeping every conv activation in HBM —
            # trades ~1/3 more FLOPs for near-forward-only memory
            forward = jax.checkpoint(forward)

        def loss_of(p):
            logits, new_state = forward(p, batch["image"])
            local = loss_fn(batch["mask"], logits,
                            weights=batch.get("loss_weights",
                                              batch.get("weights")))
            if mesh is not None:
                local = local * weight_share(batch)
            return local, (logits, new_state)

        (loss_value, (logits, new_model_state)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(params)
        if mesh is not None:
            # grads are already globally psum'ed (replicated-param cotangent);
            # batch_stats stay device-varying and need the explicit mean
            new_model_state = jax.lax.pmean(new_model_state, data_axis)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        step_metrics = compute_metrics(batch, logits)
        if skip_nonfinite:
            # failure detection: a non-finite loss or gradient (exploded
            # activations, bad page) poisons Adam's moments permanently —
            # keep the pre-step params/opt/BN state instead and report the
            # event so the Trainer can count consecutive failures.  Under a
            # mesh the grads are already globally psum'ed, so the verdict is
            # identical on every shard.
            finite = jnp.isfinite(loss_value)
            for g in jax.tree_util.tree_leaves(grads):
                finite &= jnp.all(jnp.isfinite(g))

            def keep(new, old):
                return jnp.where(finite, new, old)

            new_params = jax.tree_util.tree_map(keep, new_params, params)
            new_opt_state = jax.tree_util.tree_map(keep, new_opt_state, opt_state)
            new_model_state = jax.tree_util.tree_map(keep, new_model_state, model_state)
            step_metrics["nonfinite"] = 1.0 - finite.astype(jnp.float32)
        if mesh is None:
            if n_cw:
                # the optimized (class-weighted) objective, for visibility;
                # "loss" stays the plain monitored CE (see compute_metrics)
                step_metrics["loss_weighted"] = loss_value
            else:
                step_metrics["loss"] = loss_value
        else:
            step_metrics = reduce_metrics(step_metrics, batch)
        return new_params, new_model_state, new_opt_state, step_metrics

    def eval_core(params, model_state, batch):
        batch = unpack(batch)
        logits = module.apply({"params": params, **model_state}, batch["image"], train=False)
        m = compute_metrics(batch, logits)
        if mesh is not None:
            m = reduce_metrics(m, batch)
        return m

    if mesh is None:
        train_step = jax.jit(train_core, donate_argnums=(0, 1, 2) if donate else ())
        eval_step = jax.jit(eval_core)
        return train_step, eval_step

    def train_sharded(params, model_state, opt_state, batch, dropout_rng):
        # distinct dropout stream per shard
        dropout_rng = jax.random.fold_in(dropout_rng, jax.lax.axis_index(data_axis))
        return train_core(params, model_state, opt_state, batch, dropout_rng)

    # in_specs must mirror the batch dict's keys, which depend on the
    # transfer layout (weights map vs compact dims); build per key-set
    _compiled = {}

    def _build(keys):
        batch_spec = {key: P(data_axis) for key in keys}
        train = jax.jit(
            shard_map(
                train_sharded,
                mesh=mesh,
                in_specs=(P(), P(), P(), batch_spec, P()),
                out_specs=(P(), P(), P(), P()),
            ),
            donate_argnums=(0, 1, 2) if donate else (),
        )
        evaluate = jax.jit(
            shard_map(
                eval_core,
                mesh=mesh,
                in_specs=(P(), P(), batch_spec),
                out_specs=P(),
            )
        )
        return train, evaluate

    def _steps_for(batch):
        keys = frozenset(batch)
        if keys not in _compiled:
            _compiled[keys] = _build(keys)
        return _compiled[keys]

    def train_step(params, model_state, opt_state, batch, dropout_rng):
        return _steps_for(batch)[0](params, model_state, opt_state, batch, dropout_rng)

    def eval_step(params, model_state, batch):
        return _steps_for(batch)[1](params, model_state, batch)

    # AOT hooks mirroring jax.jit's .lower: multi-process callers compile
    # first (.lower(...).compile() — no execution), rendezvous on
    # parallel.distributed.barrier, then execute, so the short fixed Gloo
    # collective timeout never spans a compile-skew window (loaded hosts)
    def _train_lower(params, model_state, opt_state, batch, dropout_rng):
        return _steps_for(batch)[0].lower(params, model_state, opt_state, batch, dropout_rng)

    def _eval_lower(params, model_state, batch):
        return _steps_for(batch)[1].lower(params, model_state, batch)

    train_step.lower = _train_lower
    eval_step.lower = _eval_lower
    return train_step, eval_step


def make_forward_fn(module, mesh: Optional[Mesh] = None, data_axis: str = "data"):
    """Jitted batched forward (logits) — data-parallel over the mesh when
    given; used by the parallel predict executor.  ``variables`` is the full
    collection dict ({'params': ..., 'batch_stats': ...})."""

    def forward(variables, image):
        return module.apply(variables, image)

    if mesh is None:
        return jax.jit(forward)
    return jax.jit(
        shard_map(
            forward,
            mesh=mesh,
            in_specs=(P(), P(data_axis)),
            out_specs=P(data_axis),
        )
    )
