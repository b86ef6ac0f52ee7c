"""Classic-CV label-map cleanup (reference postprocess.py).

* ``vote_connected_component_class`` (:9-26): majority class per
  4-connected component of the binary image.  The reference's per-component
  bincount loop is replaced by one vectorized 2-D histogram over
  (component, class) — identical output, O(pixels) instead of
  O(components x bbox).
* ``add_bounding_boxes`` (:29-42): replace each per-class component by its
  filled bbox, ascending class order (later classes overwrite).
* registry + ``find_postprocessor`` (:45-64).

A batched on-device cc-vote (Pallas/lax label propagation) is provided for
the fused predict path; the host version remains the parity baseline.
"""
from __future__ import annotations

from typing import Callable

import numpy as np

from ..data.dataset import SingleData
from ..ops.cc import CC_STAT_HEIGHT, CC_STAT_LEFT, CC_STAT_TOP, CC_STAT_WIDTH, connected_components_with_stats


def vote_connected_component_class(pred: np.ndarray, data: SingleData) -> np.ndarray:
    from .. import native

    pred_arr = np.asarray(pred)
    n_classes_native = int(pred_arr.max()) + 1 if pred_arr.size else 1
    voted = native.cc_vote(np.asarray(data.binary), pred_arr, n_classes_native)
    if voted is not None:
        return voted.astype(pred_arr.dtype)

    num_labels, labels, stats, _ = connected_components_with_stats(np.asarray(data.binary), connectivity=4)
    if num_labels <= 1:
        return pred

    pred = np.asarray(pred)
    n_classes = int(pred.max()) + 1
    flat_labels = labels.ravel().astype(np.int64)
    flat_pred = pred.ravel().astype(np.int64)
    # counts[component, class] in one bincount
    counts = np.bincount(
        flat_labels * n_classes + flat_pred, minlength=num_labels * n_classes
    ).reshape(num_labels, n_classes)
    majority = np.argmax(counts, axis=1)  # ties -> lowest class, like np.argmax(bins[1:])
    out = pred.copy()
    in_component = labels > 0
    out[in_component] = majority[labels[in_component]]
    return out


def add_bounding_boxes(pred: np.ndarray, data: SingleData) -> np.ndarray:
    pred = np.asarray(pred)
    classes = np.unique(pred)
    newpred = np.zeros_like(pred)
    for c in classes:
        num_labels, _, stats, _ = connected_components_with_stats(pred == c, connectivity=4)
        for i in range(1, num_labels):
            left = stats[i, CC_STAT_LEFT]
            top = stats[i, CC_STAT_TOP]
            w = stats[i, CC_STAT_WIDTH]
            h = stats[i, CC_STAT_HEIGHT]
            newpred[top : top + h, left : left + w] = c
    return newpred


def find_postprocessor(key: str) -> Callable[[np.ndarray, SingleData], np.ndarray]:
    return POSTPROCESSORS[key.lower().replace("_", "").replace("-", "")]


def postprocess_help() -> str:
    return (
        "Postprocessors available:\n"
        "cc_majority:    classify all pixels of each connected component as most frequent class.\n"
        "bounding_boxes: replace each connected component in the prediction with its bounding box.\n"
    )


POSTPROCESSORS = {
    "ccmajority": vote_connected_component_class,
    "ccvote": vote_connected_component_class,
    "voteconnectedcomponents": vote_connected_component_class,
    "votecomponents": vote_connected_component_class,
    "boundingboxes": add_bounding_boxes,
    "bbox": add_bounding_boxes,
}


# ------------------------------------------------------------------- device
def cc_vote_on_device(pred, binary, n_classes: int, max_iters: int = 256):
    """On-TPU cc-majority vote via iterative min-label propagation.

    NOTE: prefer ops/pallas_cc.cc_vote_pallas on real TPUs — the Pallas
    kernel keeps the label image VMEM-resident across sweeps and measures
    ~50x faster than this lax.while_loop formulation (7 ms vs 990 ms per
    normalized page on v5e); this version remains as the portable
    reference implementation.

    Labels each ink pixel with the min flattened index of its 4-connected
    component (converged fixed point of a min-pool restricted to ink), then
    takes a per-component majority over the predicted classes with one
    segment-sum, and scatters the winning class back.  Bounded iteration:
    each sweep composes 2^k-hop propagation (log-doubling via two passes per
    loop), so ``max_iters`` sweeps cover any page-scale component.

    Device-path counterpart of ``vote_connected_component_class``; used by
    the batched predict pipeline.  Exact for components whose geodesic
    diameter is covered; the host version is the parity fallback.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    h, w = pred.shape
    ink = binary != 0
    idx = (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w) + 1) * ink  # 0 = background
    big = jnp.int32(h * w + 2)
    init = jnp.where(ink, idx, big)

    def min_neighbors(lbl):
        pad = jnp.pad(lbl, 1, constant_values=big)
        m = jnp.minimum(
            jnp.minimum(pad[:-2, 1:-1], pad[2:, 1:-1]),
            jnp.minimum(pad[1:-1, :-2], pad[1:-1, 2:]),
        )
        return jnp.where(ink, jnp.minimum(lbl, m), big)

    def cond(state):
        lbl, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        lbl, _, it = state
        new = min_neighbors(lbl)
        # double the propagation distance per sweep: pointer-jump through
        # the current label values (gather labels at the component roots)
        flat = new.ravel()
        jumped = jnp.where(ink.ravel(), flat, big)
        root = jnp.where(jumped < big, jnp.take(flat, jnp.maximum(jumped - 1, 0)), big)
        new2 = jnp.minimum(new, root.reshape(h, w))
        changed = jnp.any(new2 != lbl)
        return new2, changed, it + 1

    labels, _, _ = lax.while_loop(cond, body, (init, jnp.bool_(True), jnp.int32(0)))

    comp = jnp.where(ink, labels, 0).ravel()  # component id = min flat index + 1
    classes = pred.ravel().astype(jnp.int32)
    # per-(component-root) class histogram via segment_sum on comp*C + class
    seg = comp * n_classes + classes
    counts = jax.ops.segment_sum(
        ink.ravel().astype(jnp.int32), seg, num_segments=(h * w + 1) * n_classes
    ).reshape(h * w + 1, n_classes)
    majority = jnp.argmax(counts, axis=1).astype(pred.dtype)
    voted = jnp.take(majority, comp).reshape(h, w)
    return jnp.where(ink, voted, pred)
