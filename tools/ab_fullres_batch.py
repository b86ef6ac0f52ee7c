"""Paired A/B: batching the FULL-RESOLUTION forward (the MFU-headroom shot).

Round-3 closed most of the MFU question: the production predict program
is host+link-bound (device stage 852.6 pages/s at 3.58% MFU on the
normalized size), so FLOP-side tuning is irrelevant there.  The one
regime where the MXU actually works is the full-resolution forward (the
banded/spatial path for oversized pages): ~1.1 TFLOP/page, where the
s2d stem already measured 0.85x of dense (bench_runs/r3_ab_s2d_fullres.json).

This records the remaining lever in that regime: batching.  The FCN
families are channel-thin (<= 80 channels), so single-page dispatches
leave MXU tiles partly empty; batching N pages into one dispatch is the
standard fix.  Method mirrors ab_s2d_fullres.py: alternating paired
dispatches across batch sizes so tunnel phase drift hits all arms,
novel uint8 content per dispatch, upload outside the timed region,
8-byte checksum download to force completion.

Output: one JSON line (per-batch-size ms/page + device MFU); recorded
as bench_runs/r4_ab_fullres_batch.json (VERDICT r3 next-step #8).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ps_tpu_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import PEAK_FLOPS, fcn_skip_flops_per_page
from page_segmentation_tpu.models.fcn import FCNSkip

H, W = 3512, 2480  # A4 @ 300 DPI, rows padded to the stride factor
REPS = int(os.environ.get("AB_REPS", "6"))
BATCHES = tuple(int(b) for b in os.environ.get("AB_BATCHES", "1,2,4").split(","))


def main():
    module = FCNSkip(n_classes=3, dtype=jnp.bfloat16, s2d_stem=True)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 1), jnp.float32))["params"]

    @jax.jit
    def forward_checksum(p, x):
        logits = module.apply({"params": p}, x.astype(jnp.bfloat16))
        return jnp.sum(logits.astype(jnp.float32))

    rng = np.random.RandomState(0)
    flops_page = fcn_skip_flops_per_page(H, W)

    def batch_input(n, seed):
        # novel content per dispatch: the tunnel content-addresses
        # dispatches and replays repeats dishonestly fast
        r = np.random.RandomState(seed)
        x = r.randint(0, 256, (n, H, W, 1)).astype(np.float32) / 255.0
        # block: device_put is async, and an un-forced 35 MB/page float32
        # upload would otherwise bleed into the timed dispatch
        return jax.block_until_ready(jax.device_put(x))

    # compile + warm every arm first
    for n in BATCHES:
        float(forward_checksum(params, batch_input(n, 10_000 + n)))

    times = {n: [] for n in BATCHES}
    for rep in range(REPS):
        for n in BATCHES:  # alternate arms inside each rep
            x = batch_input(n, rep * 100 + n)
            t0 = time.perf_counter()
            float(forward_checksum(params, x))
            times[n].append(time.perf_counter() - t0)
            print(f"rep {rep} batch {n}: {times[n][-1] * 1e3:.1f} ms "
                  f"({times[n][-1] / n * 1e3:.1f} ms/page)", file=sys.stderr)

    per_page = {n: float(np.median(t)) / n for n, t in times.items()}
    base = per_page[BATCHES[0]]
    result = {
        "regime": "full-resolution batched forward, s2d stem, bf16 "
                  "(device stage only; upload excluded, checksum download)",
        "page": [H, W],
        "gflop_per_page": round(flops_page / 1e9, 1),
        "ms_per_page": {str(n): round(v * 1e3, 1) for n, v in per_page.items()},
        "mfu_device": {str(n): round(flops_page / v / PEAK_FLOPS, 4)
                       for n, v in per_page.items()},
        "speedup_vs_batch1": {str(n): round(base / v, 3)
                              for n, v in per_page.items()},
        "raw_ms": {str(n): [round(v * 1e3, 1) for v in t]
                   for n, t in times.items()},
        "note": "paired alternating dispatches, novel content each; "
                "s2d stem (the 0.85x winner of r3_ab_s2d_fullres)",
    }
    print(json.dumps(result))
    if "--record" in sys.argv:
        path = os.path.join(os.path.dirname(__file__), "..", "bench_runs",
                            "r4_ab_fullres_batch.json")
        with open(path, "w") as f:
            json.dump(result, f)
            f.write("\n")
        print(f"recorded {os.path.normpath(path)}", file=sys.stderr)


if __name__ == "__main__":
    main()
