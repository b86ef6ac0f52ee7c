"""Paired same-session A/B of the cc-majority vote backends.

Variants per batch, alternating so link/host phase drift hits all
equally (methodology of ab_s2d.py / ab_int8.py: novel content per
dispatch, forced real download in the timed region):

  none : dispatch + packed download + native finish (no vote)
  host : dispatch + packed download + native per-page union-find vote
         inside finish (cc_vote='host', the default)
  xla  : 1-bit ink pack + upload + fused device vote dispatch + packed
         download + finish (cc_vote='xla')

The timed region covers everything that differs between the variants —
the vote's true end-to-end cost wherever it runs.
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
REPS = 12
scale = 6 / 50

module = FCNSkip(n_classes=3, dtype=jnp.bfloat16)
params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1), jnp.float32))["params"]

VARIANTS = ("none", "host", "xla")
preds = {
    name: ThroughputPredictor(
        module, params, DEFAULT_IMAGE_MAP.palette, (H, W), scale,
        host_decimate=8, compute_dtype=jnp.bfloat16, download="packed",
        cc_vote=False if name == "none" else name,
        reuse_output_buffers=True,
    )
    for name in VARIANTS
}

dec_h, dec_w = preds["none"].decimated_shape
out_h, out_w = preds["none"].fused.valid_shape
rng = np.random.RandomState(0)

# warmup/compile each variant
for name, p in preds.items():
    dev = jax.device_put(rng.randint(0, 256, (BATCH, dec_h, dec_w)).astype(np.uint8))
    ink = rng.rand(BATCH, out_h, out_w) < 0.2
    t0 = time.perf_counter()
    if name == "xla":
        ink_dev = jax.device_put(p._pack_ink(ink))
        out = p.fused(p.variables, dev, p.palette_dev, ink_dev)
    else:
        out = p.fused(p.variables, dev, p.palette_dev)
    p._finish(np.asarray(out), ink)
    print(f"compile {name}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

times = {name: [] for name in VARIANTS}
for rep in range(REPS):
    order = VARIANTS[rep % 3:] + VARIANTS[: rep % 3]  # rotate start
    for name in order:
        p = preds[name]
        batch = rng.randint(0, 256, (BATCH, dec_h, dec_w)).astype(np.uint8)
        ink = rng.rand(BATCH, out_h, out_w) < 0.2
        dev = jax.device_put(batch)
        jax.block_until_ready(dev)
        t0 = time.perf_counter()
        if name == "xla":
            ink_dev = jax.device_put(p._pack_ink(ink))
            out = p.fused(p.variables, dev, p.palette_dev, ink_dev)
        else:
            out = p.fused(p.variables, dev, p.palette_dev)
        trio = p._finish(np.asarray(out), ink)  # forces the real download
        dt = time.perf_counter() - t0
        del trio
        times[name].append(dt)
        print(f"rep {rep} {name}: {dt*1e3:.1f} ms", file=sys.stderr)

med = {k: float(np.median(v)) * 1e3 for k, v in times.items()}
print(json.dumps({
    **{f"{k}_ms_median": round(v, 1) for k, v in med.items()},
    "host_over_none": round(med["host"] / med["none"], 3),
    "xla_over_none": round(med["xla"] / med["none"], 3),
    **{f"{k}_ms": [round(t * 1e3, 1) for t in times[k]] for k in VARIANTS},
    "batch": BATCH, "page": [H, W],
    "note": "paired alternating batches, novel content each; timed = "
            "dispatch + packed download + finish (+ ink pack/upload and "
            "fused device vote for xla; + host union-find vote for host)",
}))
