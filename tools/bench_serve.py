"""Serving-mode benchmark: dynamic-batching latency and throughput.

Closed-loop load against the BatchingService (the engine behind
`page-segmentation serve`): ``--clients`` concurrent submitters each
keep one full-resolution page in flight; every page rides a fused
dynamic batch (batch window ``--max-wait-ms``, cap ``--max-batch``).
Reports whole-run pages/s and per-request latency percentiles from the
service's own ServeStats, plus an optional end-to-end HTTP smoke
(PNG-in/JSON-out through PredictionServer) for the full-wire path.

Records bench_runs/r5_serve.json with --record.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ps_tpu_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pages", type=int, default=256)
    parser.add_argument("--clients", type=int, default=8)
    parser.add_argument("--height", type=int, default=3508)
    parser.add_argument("--width", type=int, default=2480)
    parser.add_argument("--max-batch", type=int, default=16)
    parser.add_argument("--max-wait-ms", type=float, default=25.0)
    parser.add_argument("--http-smoke", type=int, default=3,
                        help="requests through the real HTTP server (0=skip)")
    parser.add_argument("--prepare", default="fused",
                        choices=["fused", "spline"],
                        help="serve prepare path under test: fused = the "
                             "production device pipeline (the serve "
                             "default), spline = per-request host prepare")
    parser.add_argument("--resize-backend", default="pil",
                        choices=["pil", "scipy"],
                        help="SPLINE-prepare backend (pil = the throughput "
                             "opt-in, scipy = the bit-parity path); "
                             "recorded in the artifact")
    parser.add_argument("--record", action="store_true")
    args = parser.parse_args()

    import bench  # repo-root page synthesis (distinct pages)
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.classifier import PixelClassifier
    from page_segmentation_tpu.inference.predictor import Predictor, PredictSettings
    from page_segmentation_tpu.inference.server import BatchingService
    from page_segmentation_tpu.models.registry import Architecture

    on_tpu = jax.default_backend() != "cpu"
    classifier = PixelClassifier(
        n_classes=3, architecture=Architecture.FCN_SKIP,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    predictor = Predictor(PredictSettings(
        n_classes=3, color_map=DEFAULT_IMAGE_MAP,
        compute_dtype="bfloat16" if on_tpu else "float32",
    ), network=classifier)
    service = BatchingService(
        predictor, DEFAULT_IMAGE_MAP, default_char_height=50,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        resize_backend=args.resize_backend, prepare=args.prepare,
    )

    pages, binaries, _ = bench.synthesize_pages(
        min(args.pages, 64), args.height, args.width, seed=50_000
    )

    # warm the compile ladder outside the clock: the fast path buckets
    # dynamic batch sizes to powers of two, so one concurrent burst per
    # pow2 size compiles every program the run can hit (standard serving
    # warmup traffic)
    k = 1
    while k <= args.max_batch:
        futures = [service.submit(pages[i % pages.shape[0]],
                                  binaries[i % pages.shape[0]])
                   for i in range(k)]
        for f in futures:
            f.result()
        k *= 2
    # fresh stats for the measured run: warmup batches must not leak into
    # the recorded latency percentiles or mean_batch_size
    from page_segmentation_tpu.inference.server import ServeStats

    service.stats = ServeStats()

    t0 = time.perf_counter()

    def client(k):
        # each client walks the page set at its own stride; page content
        # repeats only after len(pages) submissions
        for i in range(k, args.pages, args.clients):
            j = i % pages.shape[0]
            service.submit(pages[j], binaries[j]).result()

    with ThreadPoolExecutor(args.clients) as pool:
        list(pool.map(client, range(args.clients)))
    wall = time.perf_counter() - t0
    snap = service.stats.snapshot()
    service.stop()

    result = {
        "metric": "serve_pages_per_sec_per_chip",
        "value": round(args.pages / wall, 2),
        "unit": "pages/sec",
        "pages": args.pages,
        "clients": args.clients,
        "wall_s": round(wall, 2),
        "page_hw": [args.height, args.width],
        "max_batch": args.max_batch,
        "max_wait_ms": args.max_wait_ms,
        "prepare": args.prepare,
        "resize_backend": args.resize_backend,
        "latency_ms": {
            k.removeprefix("latency_ms_"): snap[k]
            for k in ("latency_ms_p50", "latency_ms_p90", "latency_ms_p99")
            if snap.get(k) is not None
        },
        "mean_batch_size": snap.get("mean_batch_size"),
        "host_cpus": os.cpu_count(),
        "mode": "closed-loop in-process BatchingService (the serve "
                "engine): full-res page in, label map + trio out, fused "
                "dynamic batches",
    }

    if args.http_smoke:
        from page_segmentation_tpu.inference.server import PredictionServer
        import threading
        import urllib.request

        server = PredictionServer(service2 := BatchingService(
            predictor, DEFAULT_IMAGE_MAP, default_char_height=50,
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
            resize_backend=args.resize_backend, prepare=args.prepare,
        ))
        threading.Thread(target=server.serve_forever, daemon=True).start()
        from PIL import Image
        import io

        lat = []
        for i in range(args.http_smoke):
            buf = io.BytesIO()
            Image.fromarray(pages[i % pages.shape[0]]).save(
                buf, format="PNG", compress_level=1)
            t = time.perf_counter()
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}/predict",
                data=buf.getvalue(),
                headers={"Content-Type": "image/png"},
            )
            with urllib.request.urlopen(req, timeout=300) as resp:
                body = resp.read()
                assert resp.headers["Content-Type"] == "image/png" and body
            lat.append((time.perf_counter() - t) * 1e3)
        server.stop()
        service2.stop()
        result["http_smoke_ms"] = [round(v, 1) for v in lat]

    print(json.dumps(result))
    if args.record:
        path = os.path.join(os.path.dirname(__file__), "..", "bench_runs",
                            "r5_serve.json")
        with open(path, "w") as f:
            json.dump(result, f)
            f.write("\n")
        print(f"recorded {os.path.normpath(path)}", file=sys.stderr)


if __name__ == "__main__":
    main()
