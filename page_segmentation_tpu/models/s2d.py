"""Space-to-depth rewrite of the full-resolution stem convs.

The first two convs of the fcn/fcn_skip plan (reference model.py:45-92:
5x5 at C_in=1->20 and 20->30, stride 1, full page resolution) are the
repo's largest MFU hole: XLA's implicit GEMM feeds the 128x128 MXU a
contraction of size kh*kw*C_in = 25 for conv1, so the systolic array
runs ~1/5 full on its contraction dimension while streaming the largest
spatial extent in the network.

The exact fix: reindex the convolution on a space-to-depth(block=4)
layout.  ``x_s2d[n, i, j, (di*4+dj)*C+c] = x[n, 4i+di, 4j+dj, c]`` turns
the (5,5,C,F) stride-1 SAME conv into an equivalent (3,3,16C,16F) conv
on the 4x-smaller grid: every output pixel of the rewritten conv is a
(3*3*16C) x (16F) matmul — 144 deep at C_in=1 — which tiles onto the MXU
properly.  The rewritten kernel is a *gather with structural zeros* of
the original (built below): only 25 of the 9*16*16 (tap, phase-in,
phase-out) combinations are nonzero, so the rewrite spends 5.76x the
nominal FLOPs to buy an order of magnitude in MXU utilization.  The
arithmetic per output value is the same set of 25 multiply-adds (plus
adds of structural zeros), so results match the dense path to float
accumulation order; argmax equality is gated in
tests/test_s2d_stem.py.

Pure XLA — no Pallas — and differentiable: gradients flow through the
kernel gather back to the original (5,5,C,F) parameters, so the flag is
valid for training too and checkpoints are identical either way.

Measured (tools/ab_s2d.py, TPU v5e via the tunneled runtime,
2026-08-17): at the *production working size* — pages host-decimated 8x
then normalized to ~438x310 before the forward — the s2d program is
1.13-1.16x SLOWER than the dense path (paired alternating dispatches
with novel content, dispatch+download timed; two sessions, ratios 1.161
and 1.129 while absolute per-batch times swung 108 -> 251 ms between
sessions, so the pairing is load-bearing).  At this grid size the dense
conv1/conv2 are a small fraction of the program and the s2d
reshape/transpose overhead exceeds the MXU win.  The stem therefore
stays OPT-IN (`s2d_stem=True`): its designed regime is full-resolution
(undecimated) inputs, which only spatial-partitioned giant-page
inference uses today.  Re-evaluate with a real profiler on a
direct-attached chip before defaulting it anywhere.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp
from jax import lax


def space_to_depth(x, block: int):
    """(N, H, W, C) -> (N, H/b, W/b, b*b*C); channel = (di*b + dj)*C + c."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // block, w // block, block * block * c)


def depth_to_space(x, block: int):
    """Inverse of :func:`space_to_depth`."""
    n, hb, wb, cc = x.shape
    c = cc // (block * block)
    x = x.reshape(n, hb, wb, block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, hb * block, wb * block, c)


def _phase_maps(k: int, block: int) -> Tuple[np.ndarray, np.ndarray, int]:
    """Index/mask arrays for one spatial axis of the kernel rewrite.

    For output phase ``po`` and tap ``kh`` of the original SAME conv
    (pad = (k-1)//2), the input sample sits at s2d cell offset
    ``a = floor((po + kh - pad) / block)`` with input phase
    ``pi = (po + kh - pad) mod block``; equivalently, rewritten-kernel
    tap (a, pi, po) reads original tap ``kh = block*a + pi - po + pad``
    when that is in [0, k).  Returns (kh_idx, valid) of shape
    (A, block, block) indexed [a, pi, po], plus A (the rewritten kernel
    extent), with ``a`` shifted to start at 0.
    """
    pad = (k - 1) // 2
    amin = int(np.floor((0 + 0 - pad) / block))
    amax = int(np.floor((block - 1 + k - 1 - pad) / block))
    A = amax - amin + 1
    kh_idx = np.zeros((A, block, block), np.int32)
    valid = np.zeros((A, block, block), bool)
    for ai, a in enumerate(range(amin, amax + 1)):
        for pi in range(block):
            for po in range(block):
                kh = block * a + pi - po + pad
                if 0 <= kh < k:
                    kh_idx[ai, pi, po] = kh
                    valid[ai, pi, po] = True
    return kh_idx, valid, A


def s2d_conv_kernel(kernel, block: int = 4):
    """Rewrite a (kh, kw, cin, cout) stride-1 SAME conv kernel into the
    equivalent (A, A, block²·cin, block²·cout) kernel on the
    space-to-depth(block) layout (A = 3 for 5x5/block-4).

    Channel conventions match :func:`space_to_depth`: input channel
    ``(pi_h*block + pi_w)*cin + ci``, output ``(po_h*block + po_w)*cout
    + co``.  Zero padding of the rewritten conv corresponds exactly to
    the dense conv's zero padding (out-of-range taps read zeros in both
    formulations)."""
    k, kw_, cin, cout = kernel.shape
    assert k == kw_, "square kernels only"
    kh_idx, valid_h, A = _phase_maps(k, block)
    kw_idx, valid_w, _ = _phase_maps(k, block)

    # gather: (a, pi_h, po_h, b, pi_w, po_w, cin, cout)
    gathered = kernel[kh_idx][:, :, :, kw_idx]
    mask = valid_h[:, :, :, None, None, None] & valid_w[None, None, None]
    gathered = jnp.where(mask[..., None, None], gathered, 0)
    # -> (a, b, pi_h, pi_w, cin, po_h, po_w, cout)
    gathered = gathered.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    bb = block * block
    return gathered.reshape(A, A, bb * cin, bb * cout)


def s2d_bias(bias, block: int = 4):
    """Tile a (cout,) bias to the s2d channel order (po*cout + co)."""
    return jnp.tile(bias, block * block)


def stem_applicable(shape, block: int = 4) -> bool:
    """The rewrite needs H and W divisible by ``block`` (bucketed padded
    shapes are multiples of 8, so this holds on the hot paths; odd probe
    shapes fall back to the dense stem)."""
    return shape[1] % block == 0 and shape[2] % block == 0


def s2d_stem(x, layers, block: int = 4, dtype=None):
    """Run a chain of stride-1 SAME convs in s2d layout.

    ``layers`` is a sequence of (kernel, bias, activation) with kernels
    in the dense (k, k, cin, cout) layout; returns the chain output in
    the original (N, H, W, cout_last) layout.  One s2d at entry, one
    depth-to-space at exit — the intermediate activations never leave
    the packed layout.
    """
    y = space_to_depth(x, block)
    for kernel, bias, activation in layers:
        kp = s2d_conv_kernel(kernel, block)
        dt = dtype or y.dtype
        y = lax.conv_general_dilated(
            y.astype(dt),
            kp.astype(dt),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + s2d_bias(bias, block).astype(dt)
        if activation is not None:
            y = activation(y)
    return depth_to_space(y, block)
