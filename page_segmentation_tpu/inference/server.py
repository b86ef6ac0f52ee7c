"""Production serving: dynamic-batching HTTP prediction service.

The reference has no serving story — its deployment unit is a batch CLI
run over a directory (reference predictor.py:27-30 iterates pages in one
process and exits).  On TPU the economics invert: the chip is fast and
the per-dispatch overhead is fixed, so a long-lived service that *shares*
device dispatches between concurrent clients is the natural production
shape.  This module provides:

* ``BatchingService`` — a background worker that collects concurrent
  requests for up to ``max_wait_ms`` (or ``max_batch`` pages) and runs
  them as ONE fused device batch via ``Predictor.predict_dataset_fast``
  (bucket-grouped, padded, device-voted when configured).  Per-request
  latency under load approaches per-*batch* latency instead of
  pages x per-page latency.
* ``PredictionHandler``/``serve`` — a stdlib ``ThreadingHTTPServer``
  front end (zero extra dependencies): ``POST /predict`` with an image
  body returns the requested mask as PNG; ``GET /healthz`` and
  ``GET /stats`` support orchestration (readiness probes and
  batch-efficiency monitoring).

The worker thread owns all JAX interaction; HTTP threads only decode
images and wait on futures, so the service needs no device locking.
"""
from __future__ import annotations

import json
import logging
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from ..core.colors import ColorMap
from ..data.dataset import Dataset, SingleData
from ..data.loader import DatasetLoader
from .predictor import Predictor

logger = logging.getLogger(__name__)

OUTPUTS = ("color", "overlay", "inverted", "labels")


class ServiceOverloaded(RuntimeError):
    """The pending-request queue is at max_queue; the HTTP layer maps this
    to 503 so load balancers shed instead of piling latency."""


@dataclass
class ServeStats:
    """Batch-efficiency counters exposed at ``GET /stats``."""

    requests_total: int = 0
    batches_total: int = 0
    pages_total: int = 0
    errors_total: int = 0
    rejected_total: int = 0
    # bounded: only the tail feeds /stats, and an unbounded list grows
    # without limit in a long-lived serving process
    batch_sizes: "deque" = field(default_factory=lambda: deque(maxlen=1024))
    latency_ms: "deque" = field(default_factory=lambda: deque(maxlen=1024))

    def snapshot(self) -> dict:
        sizes = list(self.batch_sizes)[-256:]
        lat = sorted(list(self.latency_ms)[-256:])

        def pct(p):
            return round(lat[min(int(p * len(lat)), len(lat) - 1)], 1) if lat else None

        return {
            "requests_total": self.requests_total,
            "batches_total": self.batches_total,
            "pages_total": self.pages_total,
            "errors_total": self.errors_total,
            "rejected_total": self.rejected_total,
            "mean_batch_size": round(float(np.mean(sizes)), 2) if sizes else None,
            "latency_ms_p50": pct(0.50),
            "latency_ms_p90": pct(0.90),
            "latency_ms_p95": pct(0.95),
            "latency_ms_p99": pct(0.99),
        }


class BatchingService:
    """Collect concurrent predict requests into fused device batches.

    ``submit`` returns a ``Future`` resolving to a dict with the label map
    and the color/overlay/inverted trio.  One worker thread drains the
    queue: the first pending request opens a batch window of
    ``max_wait_ms``; everything that arrives inside it (up to
    ``max_batch``) rides the same ``predict_dataset_fast`` dispatch.
    """

    def __init__(
        self,
        predictor: Predictor,
        color_map: ColorMap,
        target_line_height: int = 6,
        default_char_height: Optional[int] = None,
        max_batch: int = 16,
        max_wait_ms: float = 25.0,
        max_width: Optional[int] = None,
        max_queue: int = 0,
        resize_backend: str = "scipy",
        prepare: str = "fused",
        pipeline_depth: int = 2,
    ):
        self.predictor = predictor
        self.color_map = color_map
        self.target_line_height = target_line_height
        self.default_char_height = default_char_height
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        # backpressure: reject new work beyond this many IN-FLIGHT pages
        # (accepted but unresolved — queued, prepared, or on device;
        # 0 = unbounded); rejected requests fail fast with
        # ServiceOverloaded / HTTP 503 instead of stacking latency
        self.max_queue = max_queue
        self.max_width = max_width
        # prepare="fused" (default): requests ride the production fused
        # pipeline — host box-decimate + ONE device program (cubic
        # resample + normalize + forward + argmax), the same path behind
        # `predict --pipeline` and bench.py, instead of a full-resolution
        # host spline per request (round-3 serve spent ~85% of its time
        # there: bench_runs/r3_serve.json p50 1.14 s).  prepare="spline"
        # keeps the per-request bit-parity prepare; configurations the
        # fused path cannot express (max_width downscale, high-res
        # output, post-processors beyond a lone cc-vote) fall back to it
        # automatically.
        self.prepare = prepare if prepare in ("fused", "spline") else "spline"
        if self.prepare == "fused" and not self._fused_eligible():
            logger.info("fused prepare unavailable for this configuration; "
                        "using the spline path")
            self.prepare = "spline"
        self._fused_predictors: Dict = {}
        # default is the bit-parity spline prepare; "pil" swaps in the
        # C-speed uint8 bicubic (~10x at full resolution, but it prepares
        # ~94% of pixels a few gray levels differently — an explicit
        # throughput-over-parity opt-in, gated in test_prepare.py)
        self.loader = DatasetLoader(
            target_line_height, color_map, prediction=True, max_width=max_width,
            resize_backend=resize_backend,
        )
        self.stats = ServeStats()
        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        # two-stage pipeline (the batch pipeline's overlap, across
        # requests): the collector thread decodes/prepares/uploads batch
        # k+1 while the device thread dispatches + downloads + finishes
        # batch k.  The bounded hand-off queue is the backpressure: depth
        # bounds in-flight device batches, and a full queue tells the
        # collector to keep its window open (adaptive batching).
        self._prepared: "queue.Queue" = queue.Queue(maxsize=max(1, pipeline_depth))
        # in-flight page count for backpressure: queued AND collected/
        # prepared-but-unresolved pages both hold service capacity (the
        # raw queue drains into the pipeline well before results exist,
        # so qsize alone under-counts)
        self._pending_pages = 0
        self._pending_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, name="collector", daemon=True)
        self._device_worker = threading.Thread(
            target=self._device_run, name="device", daemon=True)
        self._worker.start()
        self._device_worker.start()

    def _fused_eligible(self) -> bool:
        from .postprocess import vote_connected_component_class

        settings = self.predictor.settings
        post = settings.post_process or []
        return (
            self.max_width is None
            and not settings.high_res_output
            and post in ([], [vote_connected_component_class])
        )

    # ----------------------------------------------------------- client side
    def submit(
        self,
        image: np.ndarray,
        binary: Optional[np.ndarray] = None,
        char_height: Optional[int] = None,
    ) -> Future:
        """Enqueue one page; resolves to
        {labels, color, overlay, inverted, data}."""
        char_height = char_height or self.default_char_height
        if not char_height:
            raise ValueError("char_height required (no service default configured)")
        if binary is None:
            # same contract as the loader's fallback (reference
            # dataset.py:172: the binary defaults to the image itself,
            # binarized): white background / black ink at threshold 128
            binary = np.where(image >= 128, np.uint8(255), np.uint8(0))
        future: Future = Future()
        entry = SingleData(
            image=np.asarray(image), binary=np.asarray(binary),
            line_height_px=int(char_height), user_data=future,
        )
        # capacity claim LAST: anything above may raise on bad input, and
        # an increment without the matching enqueue would leak admission
        # capacity permanently
        with self._pending_lock:
            if self.max_queue and self._pending_pages >= self.max_queue:
                self.stats.rejected_total += 1
                raise ServiceOverloaded(
                    f"{self._pending_pages} pages pending "
                    f"(max_queue={self.max_queue})"
                )
            self._pending_pages += 1
        self.stats.requests_total += 1
        self._queue.put((time.perf_counter(), entry))
        return future

    def _pages_done(self, n: int) -> None:
        # tracked unconditionally (not just under backpressure): /stats
        # pages_in_flight must tell the truth for max_queue=0 too
        if n:
            with self._pending_lock:
                self._pending_pages -= n

    def stop(self) -> None:
        self._stop.set()
        self._queue.put(None)  # wake the collector
        self._worker.join(timeout=10)
        self._device_worker.join(timeout=10)

    # ----------------------------------------------------------- worker side
    def _collect(self) -> List:
        """Block for the first request, then hold the window open.

        Adaptive window: once ``max_wait_ms`` expires, the batch closes
        only if a pipeline slot is free — while the device stages are
        saturated, closing early buys no latency (the batch would just
        sit in the hand-off queue) and costs batch size, so collection
        continues until a slot opens or the batch fills."""
        try:
            first = self._queue.get(timeout=0.25)
        except queue.Empty:
            return []
        if first is None:
            return []
        pending = [first]
        deadline = time.perf_counter() + self.max_wait_ms / 1e3
        while len(pending) < self.max_batch:
            timeout = deadline - time.perf_counter()
            if timeout <= 0:
                if not self._prepared.full():
                    break
                timeout = 0.005  # device busy: re-check in small steps
            try:
                item = self._queue.get(timeout=timeout)
            except queue.Empty:
                continue  # top of loop decides: close or extend
            if item is None:
                break
            pending.append(item)
        return pending

    def _run(self) -> None:
        """Collector thread: batch requests and run the HOST side (group,
        pad, decimate, upload), handing prepared units to the device
        thread.  Prep of batch k+1 thereby overlaps device work on k."""
        while not self._stop.is_set():
            pending = self._collect()
            if not pending:
                continue
            t_starts = {id(e): t for t, e in pending}
            entries = [e for _, e in pending]
            try:
                units = self._prep_units(entries, t_starts)
            except Exception as exc:  # noqa: BLE001 - fail every rider
                logger.exception("batch prepare failed")
                self.stats.errors_total += len(entries)
                for entry in entries:
                    if not entry.user_data.done():
                        entry.user_data.set_exception(exc)
                self._pages_done(len(entries))
                continue
            for index, unit in enumerate(units):
                enqueued = False
                while not self._stop.is_set():
                    try:
                        self._prepared.put(unit, timeout=0.25)
                        enqueued = True
                        break
                    except queue.Full:
                        continue
                if not enqueued:
                    # stopping with accepted-but-unenqueued work: fail the
                    # riders NOW — a silently dropped unit leaves clients
                    # blocked on futures that never resolve (and leaks
                    # their in-flight capacity)
                    exc = RuntimeError("service stopped before this batch ran")
                    for _, _, members, _ in units[index:]:
                        self.stats.errors_total += len(members)
                        for entry in members:
                            if not entry.user_data.done():
                                entry.user_data.set_exception(exc)
                        self._pages_done(len(members))
                    break
        # fail anything still queued (accepted, never collected) for the
        # same reason — stop() must not leave clients hanging
        stop_exc = RuntimeError("service stopped before this batch ran")
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is None:
                continue
            _, entry = item
            if not entry.user_data.done():
                entry.user_data.set_exception(stop_exc)
                self.stats.errors_total += 1
            self._pages_done(1)
        self._prepared.put(None)  # release the device thread

    def _device_run(self) -> None:
        """Device thread: dispatch + download + finish + resolve futures."""
        while True:
            unit = self._prepared.get()
            if unit is None:
                return
            kind, payload, members, t_starts = unit
            try:
                if kind == "fused":
                    tp, prepared = payload
                    results = tp.execute_batch(prepared)
                    pred, color, overlay, inverted = results
                    done = [
                        self._payload(entry, pred[j], color[j], overlay[j],
                                      inverted[j])
                        for j, entry in enumerate(members)
                    ]
                else:  # spline: prepared dataset through the bucketed path
                    done = [
                        self._payload(data, pred, color, overlay, inverted)
                        for data, pred, color, overlay, inverted in
                        self.predictor.predict_dataset_fast(
                            payload, batch_size=self.max_batch)
                    ]
                # stats BEFORE resolution: a client that reads /stats the
                # moment its future resolves must see this batch counted
                self.stats.batches_total += 1
                self.stats.pages_total += len(done)
                self.stats.batch_sizes.append(len(done))
                for data, result in done:
                    self.stats.latency_ms.append(
                        (time.perf_counter() - t_starts[id(data)]) * 1e3
                    )
                    data.user_data.set_result(result)
                self._pages_done(len(done))
            except Exception as exc:  # noqa: BLE001 - fail every rider
                logger.exception("batch failed")
                self.stats.errors_total += len(members)
                for entry in members:
                    if not entry.user_data.done():
                        entry.user_data.set_exception(exc)
                self._pages_done(len(members))

    @staticmethod
    def _payload(data, pred, color, overlay, inverted):
        return (data, {
            "labels": pred,
            "color": color,
            "overlay": overlay,
            "inverted": inverted,
            "data": data,
        })

    def _prep_units(self, entries, t_starts) -> list:
        """Host-side stage: turn one collected batch into prepared units
        for the device thread.  Fused-eligible grayscale pages group by
        geometry and prep through ThroughputPredictor.prep_batch; color
        pages (and the spline configuration) prepare through the loader's
        spline path."""
        units = []
        if self.prepare == "fused":
            color_pages = [e for e in entries if np.asarray(e.image).ndim != 2]
            entries = [e for e in entries if np.asarray(e.image).ndim == 2]
            if color_pages:  # fused batches are single-plane
                units.append((
                    "spline", self.loader.load_data(color_pages),
                    color_pages, t_starts,
                ))
            groups: Dict = {}
            for entry in entries:
                key = entry.image.shape[:2] + (int(entry.line_height_px),)
                groups.setdefault(key, []).append(entry)
            for key, members in groups.items():
                tp = self._fused_predictor_for(key)
                n = len(members)
                n_pad = min(self.max_batch, 1 << max(0, n - 1).bit_length())
                # per-page prep (no full-res batch stacking — see
                # ThroughputPredictor.prep_pages); pad slots carry zero
                # pixels + no ink, equivalent to white-binary pad pages
                prepared = tp.prep_pages(
                    [e.image for e in members],
                    [e.binary for e in members], n_pad,
                )
                units.append(("fused", (tp, prepared), members, t_starts))
        else:
            units.append((
                "spline", self.loader.load_data(entries), entries, t_starts,
            ))
        return units

    # bound on cached fused predictors: each holds compiled programs +
    # index arrays for one (page shape, char_height); serving traffic
    # with heterogeneous page sizes would otherwise grow the cache (and
    # pay a compile per new size) without limit.  LRU keeps the hot
    # geometries; an evicted one recompiles if it returns.
    MAX_FUSED_PREDICTORS = 8

    def _fused_predictor_for(self, key):
        """One ThroughputPredictor per (page shape, char_height): the
        fused program bakes the normalized shape, so serving traffic with
        homogeneous page geometry (the production norm) compiles once."""
        if key in self._fused_predictors:
            self._fused_predictors[key] = self._fused_predictors.pop(key)
        else:
            while len(self._fused_predictors) >= self.MAX_FUSED_PREDICTORS:
                evicted = next(iter(self._fused_predictors))
                del self._fused_predictors[evicted]
                logger.info("evicted fused predictor for geometry %s", evicted)
            from .corpus import pick_host_decimate
            from .pipeline import ThroughputPredictor
            from .postprocess import vote_connected_component_class

            h, w, char_height = key
            scale = self.target_line_height / char_height
            net = self.predictor.network
            arch = net.architecture
            post = self.predictor.settings.post_process or []
            self._fused_predictors[key] = ThroughputPredictor(
                net.module,
                net.variables,
                self.color_map.palette,
                (h, w),
                scale,
                host_decimate=pick_host_decimate(scale),
                stride_factor=arch.stride_factor,
                compute_dtype=net.compute_dtype,
                download="packed" if net.n_classes <= 4 else "pred",
                cc_vote="host" if post == [vote_connected_component_class] else False,
                preprocess_mode=arch.preprocess_mode,
                int8=self.predictor.settings.int8,
                yield_pred=True,
            )
        return self._fused_predictors[key]



def _png_bytes(arr: np.ndarray) -> bytes:
    from ..core.image_io import encode_png

    return encode_png(np.ascontiguousarray(arr))


def make_handler(service: BatchingService, request_timeout_s: float = 120.0):
    class PredictionHandler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route to logging, not stderr
            logger.debug("%s - %s", self.address_string(), fmt % args)

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 - http.server API
            path = urlparse(self.path).path
            if path == "/healthz":
                import jax

                self._json(200, {
                    "status": "ok",
                    "backend": jax.default_backend(),
                    "n_devices": jax.device_count(),
                })
            elif path == "/stats":
                snapshot = service.stats.snapshot()
                snapshot["queue_depth"] = service._queue.qsize()
                snapshot["pages_in_flight"] = service._pending_pages
                snapshot["max_queue"] = service.max_queue
                self._json(200, snapshot)
            else:
                self._json(404, {"error": f"unknown path {path}"})

        def do_POST(self):  # noqa: N802 - http.server API
            parsed = urlparse(self.path)
            if parsed.path != "/predict":
                self._json(404, {"error": f"unknown path {parsed.path}"})
                return
            params = {k: v[-1] for k, v in parse_qs(parsed.query).items()}
            output = params.get("output", "color")
            if output not in OUTPUTS:
                self._json(400, {"error": f"output must be one of {OUTPUTS}"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._json(400, {"error": "empty body (send the page image)"})
                return
            body = self.rfile.read(length)
            try:
                from ..core.image_io import decode_image_bytes

                image = decode_image_bytes(body, as_gray=True)
            except Exception:
                self._json(400, {"error": "body is not a decodable image"})
                return
            try:
                char_height = params.get("char_height")
                future = service.submit(
                    image, char_height=int(char_height) if char_height else None
                )
            except ServiceOverloaded as exc:
                self.send_response(503)
                body = json.dumps({"error": str(exc)}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Retry-After", "1")
                self.end_headers()
                self.wfile.write(body)
                return
            except ValueError as exc:
                self._json(400, {"error": str(exc)})
                return
            try:
                result = future.result(timeout=request_timeout_s)
            except Exception as exc:  # noqa: BLE001 - surface batch errors
                self._json(500, {"error": f"prediction failed: {exc}"})
                return
            arr = result[output]
            if output == "labels":
                arr = arr.astype(np.uint8)
            png = _png_bytes(arr)
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(png)))
            self.end_headers()
            self.wfile.write(png)

    return PredictionHandler


class PredictionServer:
    """Own a ``BatchingService`` + ``ThreadingHTTPServer`` pair."""

    def __init__(self, service: BatchingService, host: str = "127.0.0.1", port: int = 0):
        self.service = service
        self.httpd = ThreadingHTTPServer((host, port), make_handler(service))
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start_background(self) -> None:
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, name="http", daemon=True
        )
        self._thread.start()

    def serve_forever(self) -> None:
        logger.info("serving on %s:%d", *self.httpd.server_address[:2])
        self.httpd.serve_forever()

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=10)
        self.service.stop()
