"""Paired same-session A/B: bf16 model vs int8-quantized model, device
stage only (models/quant.py).

Same methodology as ab_s2d.py: novel uint8 content per dispatch (the
tunnel content-caches identical dispatches), batches pre-uploaded, timed
region = dispatch + device compute + forced download, variants
alternating batch-by-batch so link/tunnel phase drift hits both equally.
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

module = FCNSkip(n_classes=3, dtype=jnp.bfloat16)
params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1), jnp.float32))["params"]
preds = {}
for name, int8 in (("bf16", False), ("int8", True)):
    preds[name] = ThroughputPredictor(
        module, params, DEFAULT_IMAGE_MAP.palette, (H, W), scale,
        host_decimate=8, compute_dtype=jnp.bfloat16, download="packed",
        int8=int8,
    )

dec_h, dec_w = preds["bf16"].decimated_shape
rng = np.random.RandomState(0)

# calibrate the int8 variant (one float forward) before timing
p8 = preds["int8"]
cal_batch = jax.device_put(rng.randint(0, 256, (BATCH, dec_h, dec_w)).astype(np.uint8))
amax = jax.device_get(p8._calibrate_fn(p8.variables["params"], cal_batch))
p8.variables = dict(p8.variables, amax=amax)

# warmup/compile both
for name, p in preds.items():
    dev = jax.device_put(rng.randint(0, 256, (BATCH, dec_h, dec_w)).astype(np.uint8))
    jax.block_until_ready(dev)
    t0 = time.perf_counter()
    jax.block_until_ready(p.fused(p.variables, dev, p.palette_dev))
    print(f"compile {name}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

times = {"bf16": [], "int8": []}
for rep in range(REPS):
    for name in ("bf16", "int8") if rep % 2 == 0 else ("int8", "bf16"):
        p = preds[name]
        batch = rng.randint(0, 256, (BATCH, dec_h, dec_w)).astype(np.uint8)
        dev = jax.device_put(batch)
        jax.block_until_ready(dev)
        t0 = time.perf_counter()
        out = p.fused(p.variables, dev, p.palette_dev)
        # np.asarray forces a real round trip: block_until_ready alone is
        # fabricated by the tunneled runtime
        host = np.asarray(out)
        dt = time.perf_counter() - t0
        del host
        times[name].append(dt)
        print(f"rep {rep} {name}: {dt*1e3:.1f} ms", file=sys.stderr)

med = {k: float(np.median(v)) * 1e3 for k, v in times.items()}
print(json.dumps({
    "bf16_ms_median": round(med["bf16"], 1),
    "int8_ms_median": round(med["int8"], 1),
    "int8_over_bf16": round(med["int8"] / med["bf16"], 3),
    "bf16_ms": [round(t * 1e3, 1) for t in times["bf16"]],
    "int8_ms": [round(t * 1e3, 1) for t in times["int8"]],
    "batch": BATCH, "page": [H, W],
    "note": "paired alternating dispatches, novel content each",
}))
