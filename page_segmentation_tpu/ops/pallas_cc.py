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


def _shift(arr, k: int, axis: int, fill, forward: bool):
    """arr shifted k along axis: forward -> result[i] = arr[i-k]."""
    import jax.lax as lax

    pad_shape = list(arr.shape)
    pad_shape[axis] = k
    pad = jnp.full(pad_shape, fill, arr.dtype)
    if forward:
        kept = lax.slice_in_dim(arr, 0, arr.shape[axis] - k, axis=axis)
        return jnp.concatenate([pad, kept], axis=axis)
    kept = lax.slice_in_dim(arr, k, arr.shape[axis], axis=axis)
    return jnp.concatenate([kept, pad], axis=axis)


def _seg_min_scan(val, blocked, axis: int, forward: bool, big: int):
    """Min-scan within contiguous unblocked runs along ``axis`` by
    Hillis-Steele doubling: log2(extent) combine steps, each pure shifts +
    elementwise — the in-kernel equivalent of pointer jumping (labels cross
    a straight ink run in O(log run) instead of O(run)).

    ``blocked`` is an int32 0/1 mask (Mosaic cannot shift/bitcast bool
    vregs), 1 on background."""
    k = 1
    size = val.shape[axis]
    while k < size:
        upstream_val = _shift(val, k, axis, big, forward)
        upstream_blk = _shift(blocked, k, axis, 1, forward)
        val = jnp.where(blocked != 0, val, jnp.minimum(val, upstream_val))
        blocked = jnp.maximum(blocked, upstream_blk)
        k *= 2
    return val


def _scan_cycle(labels, ink, big: int):
    """One propagation cycle: segmented min-scans along both directions of
    both axes.  Dominates a 4-neighbor sweep; converges in O(#turns of the
    component's geodesic) cycles instead of O(its length) sweeps."""
    not_ink = 1 - ink.astype(jnp.int32)
    for axis in (1, 0):
        for forward in (True, False):
            labels = _seg_min_scan(labels, not_ink, axis, forward, big)
    return jnp.where(ink, labels, big)


def _cc_kernel(ink_ref, labels_ref, iters_ref, *, max_iters: int, big: int):
    import jax.lax as lax

    h, w = ink_ref.shape
    ink = ink_ref[:] != 0
    row_ids = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    init = jnp.where(ink, row_ids * w + col_ids + 1, big)

    def sweep(state):
        labels, _, it = state
        new = _scan_cycle(labels, ink, big)
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


# VMEM budget for the single-block kernel: the scan-cycle body keeps ~13
# live int32 buffers (labels/blocked + shifted temps), so the whole label
# map must stay under ~1 MB to fit the ~16 MB/core VMEM — same accounting
# as _fit_band below.  Normalized pages (~420x300 = 128 K px) qualify;
# anything larger takes the tiled path.
_VMEM_BUDGET_PIXELS = 240_000


def _band_kernel(blocks_ref, ink_ref, out_ref, *, inner_iters: int, big: int):
    """Converge min-propagation inside one row band (+1-row halos).

    Block shapes: blocks/ink (1, T+2, W); out (1, T, W).  Halo rows carry
    the neighbor bands' current labels and are read-only context."""
    import jax.lax as lax

    window = blocks_ref[0]
    ink = ink_ref[0] != 0

    def sweep(state):
        labels, _, it = state
        new = _scan_cycle(labels, ink, big)
        # keep halo rows frozen: their updates belong to the other bands
        new = jnp.concatenate([window[:1], new[1:-1], window[-1:]], axis=0)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < inner_iters)

    labels, _, _ = lax.while_loop(cond, sweep, (window, jnp.bool_(True), jnp.int32(0)))
    out_ref[0] = labels[1:-1]


@functools.partial(
    jax.jit, static_argnames=("band", "inner_iters", "max_outer", "interpret")
)
def cc_min_label_tiled(
    ink,
    band: int = 256,
    inner_iters: int = 128,
    max_outer: int = 256,
    interpret: bool = False,
):
    """Tiled CC for pages whose label map exceeds VMEM.

    Alternates (a) a Pallas grid pass that converges each ``band``-row
    block locally in VMEM (halo rows expose the neighbor bands' labels)
    with (b) one XLA pointer-jump — ``labels = min(labels, labels[labels])``
    — that collapses label chains globally in O(log) rounds.  The outer
    fixed-point loop guarantees exactness regardless of ``inner_iters``:
    any unconverged pixel keeps the outer loop running.

    ``inner_iters`` tuning (measured on TPU v5e, 6016x4096 text-like page
    with page-spanning rules, band=56): a non-knob — the in-band
    while_loop early-exits on convergence, so budgets 8..256 all take the
    same log2(n_bands)~7 outer rounds at ~1.81 s median; the time is the
    grid passes themselves.  The default just needs to exceed the typical
    in-band convergence (a few scan cycles).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = ink.shape
    ink = ink.astype(jnp.int32)
    n_bands = -(-h // band)
    hp = n_bands * band
    big = hp * w + 2
    ink_p = jnp.pad(ink, ((0, hp - h), (0, 0)))

    import jax.lax as lax

    row_ids = lax.broadcasted_iota(jnp.int32, (hp, w), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (hp, w), 1)
    init = jnp.where(ink_p != 0, row_ids * w + col_ids + 1, big)

    ink_bands = ink_p.reshape(n_bands, band, w)
    halo_pad = jnp.full((1, 1, w), 0, jnp.int32)
    ink_blocks = jnp.concatenate(
        [
            jnp.concatenate([halo_pad, ink_bands[:-1, -1:]], axis=0),
            ink_bands,
            jnp.concatenate([ink_bands[1:, :1], halo_pad], axis=0),
        ],
        axis=1,
    )  # (B, band+2, w); halo ink rows are real so halo labels stay coherent

    kernel = functools.partial(_band_kernel, inner_iters=inner_iters, big=big)
    band_pass = functools.partial(
        pl.pallas_call,
        kernel,
        grid=(n_bands,),
        out_shape=jax.ShapeDtypeStruct((n_bands, band, w), jnp.int32),
        in_specs=[
            pl.BlockSpec((1, band + 2, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band + 2, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, band, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )()

    def outer(state):
        labels, _, it = state
        bands = labels.reshape(n_bands, band, w)
        big_row = jnp.full((1, 1, w), big, jnp.int32)
        blocks = jnp.concatenate(
            [
                jnp.concatenate([big_row, bands[:-1, -1:]], axis=0),
                bands,
                jnp.concatenate([bands[1:, :1], big_row], axis=0),
            ],
            axis=1,
        )
        new = band_pass(blocks, ink_blocks).reshape(hp, w)
        # global pointer jump: follow each label to its current root value
        flat = new.ravel()
        root = jnp.where(flat < big, jnp.take(flat, jnp.maximum(flat - 1, 0)), big)
        new = jnp.minimum(new, root.reshape(hp, w))
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_outer)

    labels, _, iters = lax.while_loop(cond, outer, (init, jnp.bool_(True), jnp.int32(0)))
    labels = jnp.where(ink_p != 0, labels, 0)
    return labels[:h], iters


def _fit_band(w: int, budget_pixels: int = 240_000) -> int:
    """Band height whose (band+2, W) working set fits the ~16 MB VMEM:
    the scan-cycle kernel keeps ~13 live int32 buffers (val/blocked plus
    shifted temps), so the block must stay under ~1 MB."""
    rows = max(budget_pixels // max(w, 1) - 2, 8)
    return max((rows // 8) * 8, 8)


def cc_min_label(ink, interpret: bool = False):
    """Size-dispatching CC: the single-block VMEM kernel for pages that
    fit, the tiled band+pointer-jump path for larger ones."""
    h, w = ink.shape
    if h * w <= _VMEM_BUDGET_PIXELS:
        return cc_min_label_pallas(ink, interpret=interpret)
    return cc_min_label_tiled(ink, band=_fit_band(w), interpret=interpret)


def _vote_from_labels(pred, ink, labels, n_classes: int):
    """Majority class per component from converged min-labels: one
    segment-sum histogram over (component, class), argmax, scatter-back."""
    h, w = pred.shape
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


def cc_vote_pallas(pred, binary, n_classes: int, interpret: bool = False):
    """cc-majority vote with the Pallas labeler (device counterpart of
    inference/postprocess.vote_connected_component_class)."""
    pred = jnp.asarray(pred)
    ink = jnp.asarray(binary) != 0
    labels, _ = cc_min_label(ink, interpret=interpret)
    return _vote_from_labels(pred, ink, labels, n_classes)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def cc_min_label_xla_batch(ink, max_iters: int = 4096):
    """(N, H, W) ink masks -> (labels int32, cycles) — pure XLA, no Pallas.

    The same segmented min-scan cycles as the Pallas kernel (Hillis-Steele
    doubling along both directions of both axes), run on HBM-resident
    arrays under one ``lax.while_loop`` for the whole batch.  Per cycle
    the arrays are rematerialized in HBM rather than staying in VMEM, but
    a normalized page is ~0.5 MB so the sweeps stay cheap — and the
    program contains no Pallas call, which matters operationally: it can
    fuse into a larger dispatch whose download overlaps other device
    traffic (this machine's tunneled runtime empties the download of a
    Pallas-bearing program under concurrent interaction — see
    tools/repro_pallas_download.py), and it passes strict ``shard_map``
    varying-axes checking.
    """
    from jax import lax

    n, h, w = ink.shape
    ink_b = ink != 0
    big = h * w + 2
    row = lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
    col = lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
    init = jnp.where(ink_b, row * w + col + 1, big)
    not_ink = 1 - ink_b.astype(jnp.int32)

    def cycle(labels):
        for axis in (2, 1):
            for forward in (True, False):
                labels = _seg_min_scan(labels, not_ink, axis, forward, big)
        return jnp.where(ink_b, labels, big)

    def sweep(state):
        labels, _, it = state
        new = cycle(labels)
        return new, jnp.any(new != labels), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    # the initial changed-flag derives from the data so that, under strict
    # shard_map, its varying-mesh-axes type matches the in-loop
    # jnp.any(new != labels) (a replicated literal True would not)
    changed0 = jnp.logical_or(jnp.any(ink_b), True)
    labels, _, iters = lax.while_loop(
        cond, sweep, (init, changed0, jnp.int32(0))
    )
    return jnp.where(ink_b, labels, 0), iters


@functools.partial(jax.jit, static_argnames=("n_classes",))
def cc_vote_batch_xla(pred, binary, n_classes: int):
    """Batched cc-majority vote, pure XLA (no Pallas): batched segmented
    min-scan labeling + ONE whole-batch segment-sum histogram (a single
    scatter-add across all pages — a ``lax.map`` of per-page votes costs
    N serialized scatter kernels on TPU).  Preferred in fused predict
    programs where the dispatch must overlap other device traffic;
    ``cc_vote_batch`` (Pallas, VMEM-resident) remains for standalone use
    and large pages."""
    from jax import lax

    pred = jnp.asarray(pred)
    ink = jnp.asarray(binary) != 0
    labels, _ = cc_min_label_xla_batch(ink)

    n, h, w = pred.shape
    comps = h * w + 1  # per-page component-id space (0 = background)
    page = lax.broadcasted_iota(jnp.int32, (n, h, w), 0)
    seg = (page * comps + labels) * n_classes + pred.astype(jnp.int32)
    counts = jax.ops.segment_sum(
        ink.ravel().astype(jnp.int32),
        seg.ravel(),
        num_segments=n * comps * n_classes,
    ).reshape(n * comps, n_classes)
    majority = jnp.argmax(counts, axis=1).astype(pred.dtype)
    voted = jnp.take(majority, (page * comps + labels).ravel()).reshape(n, h, w)
    return jnp.where(ink, voted, pred)


@functools.partial(jax.jit, static_argnames=("n_classes", "interpret"))
def cc_vote_batch(pred, binary, n_classes: int, interpret: bool = False):
    """Batched cc-majority vote: (N, H, W) pred + ink voted entirely on
    device — one dispatch for the whole batch instead of a per-page
    round-trip (the per-page path is link-bound: ~6 ms/page over the
    tunneled chip vs 0.3 ms of labeler compute).  ``lax.map`` runs pages
    sequentially; each page's label map uses the size-dispatched kernel
    (VMEM-resident when it fits, tiled bands otherwise)."""
    from jax import lax

    pred = jnp.asarray(pred)
    ink = jnp.asarray(binary) != 0

    def one(args):
        page_pred, page_ink = args
        labels, _ = cc_min_label(page_ink, interpret=interpret)
        return _vote_from_labels(page_pred, page_ink, labels, n_classes)

    return lax.map(one, (pred, ink))
