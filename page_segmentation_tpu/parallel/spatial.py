"""Spatial partitioning: one page across many chips.

The reference caps page size by host-side downscaling (max_width,
dataset.py:139-143).  On TPU the growth axis is the mesh: a page too large
for one chip's HBM is split into horizontal bands across devices
(``shard_map`` over the ``data`` axis reused as a spatial axis), each
device computes the conv stack on its band extended by a receptive-field
halo, and the valid interiors are concatenated — the overlap-tile strategy,
with halos exchanged over ICI via ``ppermute`` instead of re-reading HBM.

Because every architecture here is a finite-receptive-field conv net with
zero SAME padding, a band extended by ``margin >= receptive_field/2`` rows
reproduces the single-device output *exactly* (edge devices receive zero
halos, matching the zero padding of the unsplit image).  ``margin`` and
the band height must be multiples of the architecture's stride factor so
pooling grids align across the split.
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pad import round_up

# derived half-receptive-field margins (rows), rounded up to the stride
# factor: measured by single-row perturbation (measure_half_rf) —
# fcn_skip/fcn 72, unet 85, res_unet 109, mobile_net 44, image_res_net
# 153 — and pinned by tests/test_spatial.py, which re-measures and checks
# these stay >= actual.  The EfficientNet family is deliberately ABSENT:
# its squeeze-excitation blocks global-average-pool over the whole page,
# so a single-row perturbation moves logits arbitrarily far away
# (measured: a row-5 poke shifts 17% of a 512-row page) — banding is not
# exact there, and Predictor._use_spatial correctly refuses it.
DEFAULT_MARGINS = {
    "fcn_skip": 80,
    "fcn": 80,
    "unet": 96,
    "res_unet": 112,
    "mobile_net": 64,
    "image_res_net": 192,
}


def measure_half_rf(
    module, variables=None, height: int = 1024, width: int = 32, channels: int = 1
) -> int:
    """Empirical half receptive field of a conv module, in rows.

    Perturb one input row and find the farthest output row whose logits
    move — the exact support radius, independent of analytic layer
    bookkeeping.  Works for any finite-RF architecture (``channels=3``
    for the RGB encoder families)."""
    if variables is None:
        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, channels)))
    probe = height // 2
    base = jnp.zeros((1, height, width, channels))
    poked = base.at[0, probe].set(1.0)
    clean = np.asarray(module.apply(variables, base))
    moved = np.asarray(module.apply(variables, poked))
    support = np.flatnonzero(np.abs(moved - clean)[0].max(axis=(1, 2)) > 1e-6)
    if len(support) == 0:
        raise ValueError("perturbation produced no logit change; RF unmeasurable")
    return int(max(probe - support.min(), support.max() - probe))


def derived_margin(architecture, variables=None) -> int:
    """Stride-aligned halo margin for an architecture: measured half-RF
    rounded up to the stride factor."""
    channels = 3 if architecture.preprocess()[1] else 1
    half = measure_half_rf(architecture.model(3), variables, channels=channels)
    return round_up(half, architecture.stride_factor)


def spatial_forward(
    module,
    variables,
    image: np.ndarray,
    mesh: Mesh,
    margin: int = 96,
    axis: str = "data",
    stride_factor: int = 8,
):
    """Forward one (H, W, C) page split row-wise across the mesh.

    Returns logits (H, W, n_classes).  H is padded to
    n_devices * stride_factor internally and cropped back.
    """
    n_dev = mesh.devices.size
    margin = round_up(margin, stride_factor)
    h, w = image.shape[:2]
    c = image.shape[2] if image.ndim == 3 else 1
    arr = np.asarray(image, np.float32).reshape(h, w, c)

    padded_h = round_up(h, n_dev * stride_factor)
    padded_w = round_up(w, stride_factor)
    full = np.zeros((padded_h, padded_w, c), np.float32)
    full[:h, :w] = arr
    band_h = padded_h // n_dev

    if n_dev != 1 and band_h < 2 * margin:
        raise ValueError(
            f"band height {band_h} smaller than 2x halo margin {margin}; "
            f"use fewer devices or a taller page"
        )

    # A zero halo is NOT equivalent to SAME padding (zeros through a biased
    # conv stop being zero after one layer), so edge devices must not see a
    # synthetic margin: instead every device evaluates a uniform
    # (band_h + 2*margin)-row window whose placement shifts at the edges —
    # device 0 starts at the true page top (crop offset 0), the last device
    # ends at the true bottom (crop offset 2*margin), interior devices are
    # centered (offset margin).  All windows contain only real page rows,
    # so each output band equals the unsplit forward exactly.
    if n_dev == 1:
        # no split: the ppermute ring would wrap the band onto itself and
        # corrupt the edge rows
        logits = _banded_apply(module, variables, jnp.asarray(full)[None])[0]
        return np.asarray(logits)[:h, :w]

    run = _spatial_run(module, mesh, margin, axis)
    logits = run(variables, jnp.asarray(full))
    return np.asarray(logits)[:h, :w]


@lru_cache(maxsize=64)
def _spatial_run(module, mesh: Mesh, margin: int, axis: str):
    """Build (and cache) the jitted shard_map band program for one
    (module, mesh, margin) combination — consecutive oversized pages of
    the same shape reuse the compiled program instead of retracing."""
    n_dev = mesh.devices.size

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
    )
    def run(vars_, band):
        # band: (band_h, W, C) local shard
        index = lax.axis_index(axis)
        up = [(i, (i + 1) % n_dev) for i in range(n_dev)]  # send downward
        down = [(i, (i - 1) % n_dev) for i in range(n_dev)]  # send upward
        above2 = lax.ppermute(band[-2 * margin :], axis, up)  # above band's bottom rows
        below2 = lax.ppermute(band[: 2 * margin], axis, down)  # below band's top rows

        window_top = jnp.concatenate([band, below2], axis=0)
        window_mid = jnp.concatenate([above2[margin:], band, below2[:margin]], axis=0)
        window_bot = jnp.concatenate([above2, band], axis=0)
        window = jnp.where(
            index == 0, window_top, jnp.where(index == n_dev - 1, window_bot, window_mid)
        )
        logits = module.apply(vars_, window[None])[0]
        offset = jnp.where(index == 0, 0, jnp.where(index == n_dev - 1, 2 * margin, margin))
        return lax.dynamic_slice_in_dim(logits, offset, band.shape[0], axis=0)

    return jax.jit(run)


def spatial_forward_batch(
    module,
    variables,
    pages: np.ndarray,
    mesh: Mesh,
    margin: int = 96,
    data_axis: str = "data",
    space_axis: str = "space",
    stride_factor: int = 8,
):
    """Forward a batch of same-sized pages over a 2-D (pages x bands) mesh.

    The batch splits across ``data_axis`` and every page's rows split
    across ``space_axis`` with the same uniform-window halo scheme as
    :func:`spatial_forward` (exact vs the unsplit forward).  This is the
    growth layout when both many pages *and* pages too big for one chip
    are in play: grads/batches ride the data axis, halos ride the space
    axis, both over ICI.
    """
    n_space = dict(zip(mesh.axis_names, mesh.devices.shape))[space_axis]
    n_data = dict(zip(mesh.axis_names, mesh.devices.shape))[data_axis]
    margin = round_up(margin, stride_factor)
    n, h, w = pages.shape[:3]
    c = pages.shape[3] if pages.ndim == 4 else 1
    arr = np.asarray(pages, np.float32).reshape(n, h, w, c)

    padded_n = round_up(n, n_data)
    padded_h = round_up(h, n_space * stride_factor)
    padded_w = round_up(w, stride_factor)
    full = np.zeros((padded_n, padded_h, padded_w, c), np.float32)
    full[:n, :h, :w] = arr
    band_h = padded_h // n_space

    if n_space != 1 and band_h < 2 * margin:
        raise ValueError(
            f"band height {band_h} smaller than 2x halo margin {margin}; "
            f"use fewer space-axis devices or taller pages"
        )

    if n_space == 1:
        # data-parallel only: halo exchange would wrap each band onto itself
        @partial(shard_map, mesh=mesh, in_specs=(P(), P(data_axis)), out_specs=P(data_axis))
        def run_data_only(vars_, batch):
            return module.apply(vars_, batch)

        logits = run_data_only(variables, jnp.asarray(full))
        return np.asarray(logits)[:n, :h, :w]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(data_axis, space_axis)),
        out_specs=P(data_axis, space_axis),
    )
    def run(vars_, band):
        # band: (N/n_data, band_h, W, C) local shard
        index = lax.axis_index(space_axis)
        down = [(i, (i + 1) % n_space) for i in range(n_space)]
        up = [(i, (i - 1) % n_space) for i in range(n_space)]
        above2 = lax.ppermute(band[:, -2 * margin :], space_axis, down)
        below2 = lax.ppermute(band[:, : 2 * margin], space_axis, up)

        window_top = jnp.concatenate([band, below2], axis=1)
        window_mid = jnp.concatenate([above2[:, margin:], band, below2[:, :margin]], axis=1)
        window_bot = jnp.concatenate([above2, band], axis=1)
        window = jnp.where(
            index == 0, window_top,
            jnp.where(index == n_space - 1, window_bot, window_mid),
        )
        logits = module.apply(vars_, window)
        offset = jnp.where(index == 0, 0, jnp.where(index == n_space - 1, 2 * margin, margin))
        return lax.dynamic_slice_in_dim(logits, offset, band.shape[1], axis=1)

    logits = run(variables, jnp.asarray(full))
    return np.asarray(logits)[:n, :h, :w]


def spatial_predict(
    classifier,
    image: np.ndarray,
    mesh: Mesh,
    margin: Optional[int] = None,
):
    """argmax prediction for one oversized page via spatial partitioning."""
    margin = margin or DEFAULT_MARGINS.get(classifier.architecture.value, 192)
    arr = np.asarray(classifier.preprocess(np.asarray(image, np.float32)))
    if arr.ndim == 2:
        arr = arr[..., None]
    logits = spatial_forward(
        classifier.module,
        classifier.variables,
        arr,
        mesh,
        margin=margin,
        stride_factor=classifier.architecture.stride_factor,
    )
    return logits.argmax(-1)


@partial(jax.jit, static_argnums=0)
def _banded_apply(module, variables, window):
    # module is a static (hashable frozen-dataclass) arg: the trace caches
    # globally per (module, window shape) — pages after the first reuse
    # the compiled program instead of retracing per banded_forward call
    return module.apply(variables, window)


def banded_forward(
    module,
    variables,
    image: np.ndarray,
    band_rows: int = 1024,
    margin: int = 96,
    stride_factor: int = 8,
):
    """Forward one (H, W, C) page in sequential row bands on ONE device.

    Peak HBM is bounded by one (band_rows + 2*margin)-row window's
    activations instead of the whole page's — the single-chip complement
    of :func:`spatial_forward` for pages whose activations exceed HBM
    (the reference's only recourse is host downscaling,
    dataset.py:139-143).  Same uniform-window halo scheme, so every
    window holds only real page rows and the result is exact; one fixed
    window shape means one compiled program for all bands.
    """
    margin = round_up(margin, stride_factor)
    band_rows = round_up(max(band_rows, stride_factor), stride_factor)
    h, w = image.shape[:2]
    c = image.shape[2] if image.ndim == 3 else 1
    arr = np.asarray(image, np.float32).reshape(h, w, c)

    padded_h = round_up(h, stride_factor)
    padded_w = round_up(w, stride_factor)
    win_h = band_rows + 2 * margin
    if win_h >= padded_h:  # page fits one window: no banding needed
        full = np.zeros((padded_h, padded_w, c), np.float32)
        full[:h, :w] = arr
        return np.asarray(
            _banded_apply(module, variables, jnp.asarray(full)[None])[0]
        )[:h, :w]

    full = np.zeros((padded_h, padded_w, c), np.float32)
    full[:h, :w] = arr

    out = None
    for start in range(0, padded_h, band_rows):
        rows = min(band_rows, padded_h - start)
        lo = min(max(0, start - margin), padded_h - win_h)
        window = jnp.asarray(full[lo : lo + win_h])[None]
        logits = np.asarray(_banded_apply(module, variables, window)[0])
        if out is None:
            out = np.empty((padded_h, padded_w, logits.shape[-1]), logits.dtype)
        offset = start - lo
        out[start : start + rows] = logits[offset : offset + rows]
    return out[:h, :w]
