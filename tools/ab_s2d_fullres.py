"""Paired A/B of the s2d stem at its DESIGNED regime: full-resolution
inputs (the spatial-partitioned giant-page path), stem only.

ab_s2d.py measures the production predict pipeline, where the stem runs
at the ~440x310 normalized scale and s2d loses to its own reshape
overhead.  Here the two stem convs (the only layers s2d rewrites) run at
full page resolution, where they are ~2/3 of the whole network's FLOPs
and the dense path starves the MXU (contraction depth 25 at C_in=1).

Methodology per docs/PERFORMANCE.md: novel content per dispatch, paired
alternating variants, forced (checksum) download in the timed region.
"""
import os, time, json, sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ps_tpu_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import argparse

parser = argparse.ArgumentParser()
parser.add_argument("--height", type=int, default=2048)
parser.add_argument("--width", type=int, default=1536)
parser.add_argument("--batch", type=int, default=8)
parser.add_argument("--repeats", type=int, default=10)
args = parser.parse_args()

H, W, BATCH = args.height, args.width, args.batch

from page_segmentation_tpu.models.layers import relu
from page_segmentation_tpu.models.s2d import s2d_stem

rng = np.random.RandomState(0)
k1 = rng.randn(5, 5, 1, 20).astype(np.float32) * 0.1
b1 = rng.randn(20).astype(np.float32) * 0.1
k2 = rng.randn(5, 5, 20, 30).astype(np.float32) * 0.1
b2 = rng.randn(30).astype(np.float32) * 0.1
weights = tuple(jnp.asarray(a) for a in (k1, b1, k2, b2))


@jax.jit
def dense(x, k1, b1, k2, b2):
    from jax import lax

    y = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k1.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = relu(y + b1.astype(jnp.bfloat16))
    y = lax.conv_general_dilated(
        y, k2.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b2.astype(jnp.bfloat16)
    return jnp.sum(y.astype(jnp.float32))


@jax.jit
def s2d(x, k1, b1, k2, b2):
    y = s2d_stem(x, [(k1, b1, relu), (k2, b2, None)], block=4,
                 dtype=jnp.bfloat16)
    return jnp.sum(y.astype(jnp.float32))


variants = {"dense": dense, "s2d": s2d}

gflop = 2.0 * H * W * (1 * 20 * 25 + 20 * 30 * 25) * BATCH / 1e9
print(f"stem at {H}x{W} batch {BATCH}: {gflop:.1f} GFLOP/dispatch",
      file=sys.stderr)

# warmup/compile
for name, fn in variants.items():
    x = jax.device_put(rng.rand(BATCH, H, W, 1).astype(np.float32))
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    float(fn(x, *weights))
    print(f"compile {name}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

times = {"dense": [], "s2d": []}
for rep in range(args.repeats):
    for name in ("dense", "s2d") if rep % 2 == 0 else ("s2d", "dense"):
        x = jax.device_put(rng.rand(BATCH, H, W, 1).astype(np.float32))
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        checksum = float(variants[name](x, *weights))  # scalar download blocks
        dt = time.perf_counter() - t0
        times[name].append(dt)
        print(f"rep {rep} {name}: {dt*1e3:.1f} ms (sum={checksum:.1f})",
              file=sys.stderr)

med = {k: float(np.median(v)) * 1e3 for k, v in times.items()}
print(json.dumps({
    "dense_ms_median": round(med["dense"], 1),
    "s2d_ms_median": round(med["s2d"], 1),
    "s2d_over_dense": round(med["s2d"] / med["dense"], 3),
    "dense_mfu": round(gflop / med["dense"] / 394, 4),
    "s2d_mfu": round(gflop * 5.76 / med["s2d"] / 394, 4),
    "dense_ms": [round(t * 1e3, 1) for t in times["dense"]],
    "s2d_ms": [round(t * 1e3, 1) for t in times["s2d"]],
    "batch": BATCH, "shape": [H, W], "gflop_per_dispatch": round(gflop, 1),
    "note": "stem-only at full resolution (s2d's designed regime); s2d_mfu "
            "counts its structural-zero FLOPs (5.76x nominal)",
}))
