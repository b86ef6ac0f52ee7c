"""Pallas TPU kernel: connected-component min-label propagation.

On-device CC is the enabler for fully-on-TPU postprocessing
(BASELINE.json throughput config: "on-device connected-components +
overlay").  The lax.while_loop formulation (inference/postprocess.py)
re-materializes the label map in HBM every sweep; this kernel keeps the
whole label image resident in VMEM (a normalized page at int32 is ~0.5 MB,
far under the ~16 MB budget) and iterates 4-neighbor min-propagation to a
fixed point with an SMEM changed-flag for early exit — sweeps cost VMEM
bandwidth only.

Labels: ink pixels get (flat_index + 1) initially and converge to the
minimum flat index + 1 of their 4-connected component; background is 0.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cc_kernel(ink_ref, labels_ref, iters_ref, *, max_iters: int, big: int):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    h, w = ink_ref.shape
    ink = ink_ref[:] != 0
    row_ids = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    init = jnp.where(ink, row_ids * w + col_ids + 1, big)

    def sweep(state):
        labels, _, it = state
        up = jnp.concatenate([jnp.full((1, w), big, jnp.int32), labels[:-1, :]], axis=0)
        down = jnp.concatenate([labels[1:, :], jnp.full((1, w), big, jnp.int32)], axis=0)
        left = jnp.concatenate([jnp.full((h, 1), big, jnp.int32), labels[:, :-1]], axis=1)
        right = jnp.concatenate([labels[:, 1:], jnp.full((h, 1), big, jnp.int32)], axis=1)
        neighbor_min = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))
        new = jnp.where(ink, jnp.minimum(labels, neighbor_min), big)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    labels, _, iters = lax.while_loop(cond, sweep, (init, jnp.bool_(True), jnp.int32(0)))
    labels_ref[:] = jnp.where(ink, labels, 0)
    iters_ref[0] = iters


@functools.partial(jax.jit, static_argnames=("max_iters", "interpret"))
def cc_min_label_pallas(ink, max_iters: int = 4096, interpret: bool = False):
    """(H, W) ink mask -> (labels int32 (H, W), sweeps int32).

    labels[p] = min flat index + 1 over p's 4-connected component (0 on
    background).  ``sweeps`` is the number of propagation iterations used.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = ink.shape
    big = h * w + 2  # static sentinel > any real label
    kernel = functools.partial(_cc_kernel, max_iters=max_iters, big=big)
    labels, iters = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(ink.astype(jnp.int32))
    return labels, iters[0]


def cc_vote_pallas(pred, binary, n_classes: int, interpret: bool = False):
    """cc-majority vote with the Pallas labeler (device counterpart of
    inference/postprocess.vote_connected_component_class)."""
    pred = jnp.asarray(pred)
    ink = jnp.asarray(binary) != 0
    h, w = pred.shape
    labels, _ = cc_min_label_pallas(ink, interpret=interpret)

    comp = labels.ravel()
    classes = pred.ravel().astype(jnp.int32)
    counts = jax.ops.segment_sum(
        ink.ravel().astype(jnp.int32),
        comp * n_classes + classes,
        num_segments=(h * w + 1) * n_classes,
    ).reshape(h * w + 1, n_classes)
    majority = jnp.argmax(counts, axis=1).astype(pred.dtype)
    voted = jnp.take(majority, comp).reshape(h, w)
    return jnp.where(ink, voted, pred)
