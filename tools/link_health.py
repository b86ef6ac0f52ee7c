"""Probe the host<->TPU link health in isolation.

The tunneled runtime's throughput swings several-x between sessions and
can degrade to pathological levels (observed: 61 s for a 2 MB download).
Every bench number is the product of framework cost x link phase, so
before comparing BENCH_r*.json across rounds, run this probe and read
the link's own numbers.

Measures, with novel content per transfer (the tunnel content-addresses
transfers; repeats replay from a cache and time dishonestly):

  upload_mb_s    host->device device_put of fresh uint8 MBs
  download_mb_s  device->host np.asarray of a fresh device array
  dispatch_ms    round-trip of a tiny dispatch + 8-byte download
                 (link latency floor, compute-free)

Prints one JSON line.  Healthy phases (round-1..4 sessions): upload and
download both > 20 MB/s, dispatch < 150 ms.  Use --mb to size transfers.
"""
import argparse
import json
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mb", type=int, default=4, help="transfer size in MB")
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    device = jax.devices()[0]
    print(f"device: {device}", file=sys.stderr)

    n = args.mb * (1 << 20)
    rng = np.random.RandomState(0)

    up, down, rtt = [], [], []
    tiny = jax.jit(lambda x: jnp.sum(x) + 1)
    # compile outside the timers
    int(tiny(jnp.ones(8, jnp.int32)))
    for rep in range(args.reps):
        host = rng.randint(0, 256, n, dtype=np.uint8)  # novel content per rep
        t0 = time.perf_counter()
        dev = jax.block_until_ready(jax.device_put(host))
        up.append(time.perf_counter() - t0)

        # fresh device content so the download isn't a cached replay
        shifted = jax.block_until_ready(dev + np.uint8(rep + 1))
        t0 = time.perf_counter()
        np.asarray(shifted)
        down.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        int(tiny(jnp.full(8, rep, jnp.int32)))
        rtt.append(time.perf_counter() - t0)

    result = {
        "metric": "link_health",
        "mb": args.mb,
        "upload_mb_s": round(args.mb / float(np.median(up)), 2),
        "download_mb_s": round(args.mb / float(np.median(down)), 2),
        "dispatch_ms": round(float(np.median(rtt)) * 1e3, 1),
        "upload_s": [round(t, 3) for t in up],
        "download_s": [round(t, 3) for t in down],
        "healthy": bool(
            args.mb / np.median(up) > 20
            and args.mb / np.median(down) > 20
            and np.median(rtt) < 0.15
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
