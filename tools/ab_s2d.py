"""Paired same-session A/B: dense stem vs s2d stem, device stage only.

Novel uint8 content per dispatch (the tunnel content-caches identical
dispatches); batches pre-uploaded so the timed region is dispatch +
device compute + 8-byte-free packed download handle, mirroring the
corpus bench's `device` stage.  Variants alternate batch-by-batch so
link/tunnel phase drift hits both equally.
"""
import os, time, json, sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ps_tpu_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
from page_segmentation_tpu.inference.pipeline import ThroughputPredictor
from page_segmentation_tpu.models.fcn import FCNSkip

H, W = 3508, 2480
BATCH = 48
REPS = 10
scale = 6 / 50

preds = {}
for name, s2d in (("dense", False), ("s2d", True)):
    module = FCNSkip(n_classes=3, dtype=jnp.bfloat16, s2d_stem=s2d)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1), jnp.float32))["params"]
    preds[name] = ThroughputPredictor(
        module, params, DEFAULT_IMAGE_MAP.palette, (H, W), scale,
        host_decimate=8, compute_dtype=jnp.bfloat16, download="packed",
    )

dec_h, dec_w = preds["dense"].decimated_shape
rng = np.random.RandomState(0)

# warmup/compile both
for name, p in preds.items():
    dev = jax.device_put(rng.randint(0, 256, (BATCH, dec_h, dec_w)).astype(np.uint8))
    jax.block_until_ready(dev)
    t0 = time.perf_counter()
    jax.block_until_ready(p.fused(p.variables, dev, p.palette_dev))
    print(f"compile {name}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

times = {"dense": [], "s2d": []}
for rep in range(REPS):
    for name in ("dense", "s2d") if rep % 2 == 0 else ("s2d", "dense"):
        p = preds[name]
        batch = rng.randint(0, 256, (BATCH, dec_h, dec_w)).astype(np.uint8)
        dev = jax.device_put(batch)
        jax.block_until_ready(dev)
        t0 = time.perf_counter()
        out = p.fused(p.variables, dev, p.palette_dev)
        # np.asarray forces a real round trip: block_until_ready alone is
        # fabricated by the tunneled runtime (returns in ~0.3 ms for a
        # 48-page batch, below the chip's physical minimum)
        host = np.asarray(out)
        dt = time.perf_counter() - t0
        del host
        times[name].append(dt)
        print(f"rep {rep} {name}: {dt*1e3:.1f} ms", file=sys.stderr)

med = {k: float(np.median(v)) * 1e3 for k, v in times.items()}
print(json.dumps({
    "dense_ms_median": round(med["dense"], 1),
    "s2d_ms_median": round(med["s2d"], 1),
    "s2d_over_dense": round(med["s2d"] / med["dense"], 3),
    "dense_ms": [round(t * 1e3, 1) for t in times["dense"]],
    "s2d_ms": [round(t * 1e3, 1) for t in times["s2d"]],
    "batch": BATCH, "page": [H, W], "note": "paired alternating dispatches, novel content each",
}))
