"""Serving layer: dynamic batching service + HTTP front end.

The service must (a) return exactly what the library predict path returns,
(b) actually batch concurrent requests into shared dispatches, and
(c) speak well-formed HTTP including the error paths.
"""
import io
import json
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest

from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
from page_segmentation_tpu.data.dataset import SingleData
from page_segmentation_tpu.data.loader import DatasetLoader
from page_segmentation_tpu.inference.classifier import PixelClassifier
from page_segmentation_tpu.inference.predictor import Predictor, PredictSettings
from page_segmentation_tpu.inference.server import (
    BatchingService,
    PredictionServer,
)


def make_page(seed: int = 0, h: int = 64, w: int = 48):
    rng = np.random.RandomState(seed)
    page = np.full((h, w), 240, np.uint8)
    page[20:44, 12:36] = rng.randint(10, 60, (24, 24)).astype(np.uint8)
    return page


@pytest.fixture(scope="module")
def service():
    network = PixelClassifier(n_classes=3, seed=0)
    predictor = Predictor(
        PredictSettings(color_map=DEFAULT_IMAGE_MAP, n_classes=3),
        network=network,
    )
    svc = BatchingService(
        predictor,
        DEFAULT_IMAGE_MAP,
        target_line_height=8,
        default_char_height=8,
        max_batch=8,
        max_wait_ms=60.0,
    )
    yield svc
    svc.stop()


def reference_result(service, page):
    """What the library predict path produces for the same page."""
    binary = np.where(page >= 128, np.uint8(255), np.uint8(0))
    loader = DatasetLoader(8, DEFAULT_IMAGE_MAP, prediction=True)
    dataset = loader.load_data(
        [SingleData(image=page.copy(), binary=binary, line_height_px=8)]
    )
    (result,) = list(
        service.predictor.predict_dataset_fast(dataset, batch_size=1)
    )
    return result


def test_submit_matches_library_path(service):
    """The default (fused-prepare) service must agree with the spline
    library path at the argmax level — the fused path inverts/normalizes
    on device in float32 while the spline parity path prepares in host
    float64, so isolated argmax ties may flip (same contract as the
    pipeline headline path); anything beyond stray ties is a bug."""
    page = make_page(0)
    assert service.prepare == "fused"
    got = service.submit(page).result(timeout=120)
    _, pred, color, overlay, inverted = reference_result(service, page)
    assert got["labels"].shape == pred.shape
    agree = float((got["labels"] == pred).mean())
    assert agree >= 0.99, agree
    assert float((got["color"] == color).mean()) >= 0.99


def test_fused_service_equals_direct_throughput_predictor(service):
    """Exact gate: the fused service IS the ThroughputPredictor path —
    same page in, identical labels + trio out."""
    from page_segmentation_tpu.inference.corpus import pick_host_decimate
    from page_segmentation_tpu.inference.pipeline import ThroughputPredictor

    page = make_page(3)
    got = service.submit(page).result(timeout=120)
    net = service.predictor.network
    tp = ThroughputPredictor(
        net.module, net.variables, DEFAULT_IMAGE_MAP.palette,
        page.shape, 1.0, host_decimate=pick_host_decimate(1.0),
        compute_dtype=net.compute_dtype, download="packed", yield_pred=True,
    )
    binary = np.where(page >= 128, np.uint8(255), np.uint8(0))
    (pred, color, overlay, inverted), = list(
        tp.run(page[None], binary[None], batch_size=1))
    np.testing.assert_array_equal(got["labels"], pred[0])
    np.testing.assert_array_equal(got["color"], color[0])
    np.testing.assert_array_equal(got["overlay"], overlay[0])
    np.testing.assert_array_equal(got["inverted"], inverted[0])


def test_spline_service_matches_library_path_exactly():
    """prepare='spline' stays the bit-parity opt-in: byte-identical to
    the library predict path."""
    network = PixelClassifier(n_classes=3, seed=0)
    predictor = Predictor(
        PredictSettings(color_map=DEFAULT_IMAGE_MAP, n_classes=3),
        network=network,
    )
    svc = BatchingService(
        predictor, DEFAULT_IMAGE_MAP, target_line_height=8,
        default_char_height=8, max_batch=8, max_wait_ms=60.0,
        prepare="spline",
    )
    try:
        page = make_page(0)
        got = svc.submit(page).result(timeout=120)
        _, pred, color, overlay, inverted = reference_result(svc, page)
        np.testing.assert_array_equal(got["labels"], pred)
        np.testing.assert_array_equal(got["color"], color)
        np.testing.assert_array_equal(got["overlay"], overlay)
        np.testing.assert_array_equal(got["inverted"], inverted)
    finally:
        svc.stop()


def test_fused_falls_back_when_ineligible():
    """Configurations the fused path cannot express (max_width, high-res
    output, generic post-processors) silently use the spline path."""
    network = PixelClassifier(n_classes=3, seed=0)
    predictor = Predictor(
        PredictSettings(color_map=DEFAULT_IMAGE_MAP, n_classes=3),
        network=network,
    )
    svc = BatchingService(
        predictor, DEFAULT_IMAGE_MAP, target_line_height=8,
        default_char_height=8, max_width=40,
    )
    try:
        assert svc.prepare == "spline"
    finally:
        svc.stop()


def test_concurrent_requests_share_batches(service):
    batches_before = service.stats.batches_total
    futures = [service.submit(make_page(i)) for i in range(6)]
    results = [f.result(timeout=120) for f in futures]
    assert all(r["labels"].shape == (64, 48) for r in results)
    new_batches = service.stats.batches_total - batches_before
    # 6 requests enqueued faster than the window closes: fewer batches
    # than requests proves dispatch sharing
    assert 1 <= new_batches < 6
    assert max(list(service.stats.batch_sizes)[-new_batches:]) >= 2


def test_submit_requires_char_height():
    network = PixelClassifier(n_classes=3, seed=0)
    predictor = Predictor(
        PredictSettings(color_map=DEFAULT_IMAGE_MAP, n_classes=3), network=network
    )
    svc = BatchingService(predictor, DEFAULT_IMAGE_MAP, target_line_height=8)
    try:
        with pytest.raises(ValueError, match="char_height"):
            svc.submit(make_page(0))
    finally:
        svc.stop()


@pytest.fixture(scope="module")
def server(service):
    srv = PredictionServer(service, host="127.0.0.1", port=0)
    srv.start_background()
    yield srv
    srv.httpd.shutdown()
    srv.httpd.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as resp:
        return resp.status, resp.read()


def test_healthz(server):
    status, body = _get(f"http://127.0.0.1:{server.port}/healthz")
    payload = json.loads(body)
    assert status == 200
    assert payload["status"] == "ok"
    assert payload["n_devices"] >= 1


def test_stats_endpoint(server):
    status, body = _get(f"http://127.0.0.1:{server.port}/stats")
    payload = json.loads(body)
    assert status == 200
    assert payload["requests_total"] >= 0


def _post_png(port, page, query=""):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(page).save(buf, format="PNG")
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict{query}", data=buf.getvalue(), method="POST"
    )
    return urllib.request.urlopen(req, timeout=120)


def test_http_predict_color(server, service):
    from PIL import Image

    page = make_page(7)
    with _post_png(server.port, page) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "image/png"
        out = np.asarray(Image.open(io.BytesIO(resp.read())))
    _, _, color, _, _ = reference_result(service, page)
    # fused-prepare service: argmax-level agreement with the spline
    # parity path (isolated float ties may flip — see
    # test_submit_matches_library_path)
    assert out.shape == color.shape
    assert float((out == color).mean()) >= 0.99


def test_http_predict_labels_output(server):
    from PIL import Image

    page = make_page(8)
    with _post_png(server.port, page, "?output=labels&char_height=8") as resp:
        out = np.asarray(Image.open(io.BytesIO(resp.read())))
    assert out.shape == (64, 48)
    assert out.max() < 3


def test_http_bad_requests(server):
    port = server.port
    # invalid output name
    with pytest.raises(urllib.error.HTTPError) as err:
        _post_png(port, make_page(0), "?output=bogus")
    assert err.value.code == 400
    # body not an image
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=b"not a png", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=60)
    assert err.value.code == 400
    # unknown path
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=60)
    assert err.value.code == 404


def test_http_concurrent_clients(server, service):
    """Parallel HTTP clients all succeed and share device batches."""
    pages = [make_page(100 + i) for i in range(5)]
    results = [None] * len(pages)
    errors = []

    def hit(i):
        try:
            with _post_png(server.port, pages[i]) as resp:
                results[i] = resp.read()
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(len(pages))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    assert all(r and r[:4] == b"\x89PNG" for r in results)


def test_serve_cli_parser():
    from page_segmentation_tpu.cli.main import build_parser

    args = build_parser().parse_args(
        ["serve", "--load", "/tmp/model", "--port", "0", "--char_height", "8",
         "--max_batch", "4", "--max_wait_ms", "10"]
    )
    assert args.func.__name__ == "cmd_serve"
    assert args.max_batch == 4


def test_int8_service_agrees_with_float():
    """An int8-quantized service (serve --int8) stays close to the float
    service on the same page (exact gates live in tests/test_quant.py)."""
    page = make_page(3, h=96, w=80)
    results = {}
    for int8 in (False, True):
        network = PixelClassifier(n_classes=3, seed=0, int8=int8)
        predictor = Predictor(
            PredictSettings(color_map=DEFAULT_IMAGE_MAP, n_classes=3),
            network=network,
        )
        svc = BatchingService(
            predictor, DEFAULT_IMAGE_MAP, target_line_height=8,
            default_char_height=8, max_batch=4, max_wait_ms=10.0,
        )
        try:
            results[int8] = svc.submit(page).result(timeout=300)
        finally:
            svc.stop()
    assert results[True]["labels"].shape == results[False]["labels"].shape
    agree = (results[True]["labels"] == results[False]["labels"]).mean()
    # random-init logits are near-tied, so int8 rounding flips more
    # argmaxes than on a trained net; 0.9 matches tests/test_quant.py
    assert agree >= 0.9


def test_backpressure_rejects_beyond_max_queue():
    """With max_queue set, submits beyond the pending limit fail fast with
    ServiceOverloaded (counted in stats); queued work still completes."""
    import time

    from page_segmentation_tpu.inference.server import ServiceOverloaded

    network = PixelClassifier(n_classes=3, seed=0)
    predictor = Predictor(
        PredictSettings(color_map=DEFAULT_IMAGE_MAP, n_classes=3),
        network=network,
    )
    # prepare="spline" so the gated predict_dataset_fast below is the
    # path actually serving requests: under the fused default, a batch
    # whose program is already compiled (any prior same-geometry test)
    # resolves before the overload submit, releasing its capacity and
    # flaking the DID-NOT-RAISE (observed full-suite vs solo)
    svc = BatchingService(
        predictor, DEFAULT_IMAGE_MAP, target_line_height=8,
        default_char_height=8, max_batch=1, max_wait_ms=1.0, max_queue=2,
        prepare="spline",
    )
    gate = threading.Event()
    orig = predictor.predict_dataset_fast

    def gated(dataset, batch_size=1, **kw):
        gate.wait(timeout=60)
        yield from orig(dataset, batch_size=batch_size, **kw)

    predictor.predict_dataset_fast = gated
    try:
        # max_queue counts IN-FLIGHT pages (accepted, unresolved): the
        # gated first page holds capacity until its future settles —
        # with the collector/device pipeline, the raw queue drains into
        # prepared units long before results exist, so a qsize-based
        # limit would admit unbounded work while the device is busy
        first = svc.submit(make_page(0))  # picked up by the worker, gated
        time.sleep(0.4)
        queued = svc.submit(make_page(1))  # fills the 2-page limit
        with pytest.raises(ServiceOverloaded, match="max_queue"):
            svc.submit(make_page(3))
        assert svc.stats.rejected_total == 1
        gate.set()
        for f in [first, queued]:
            assert f.result(timeout=300)["labels"].shape == (64, 48)
        # resolved pages release their capacity: a new submit is accepted
        assert svc.submit(make_page(4)).result(timeout=300)["labels"].size
    finally:
        gate.set()
        svc.stop()
        predictor.predict_dataset_fast = orig


def test_http_503_on_overload(server, service):
    """The HTTP layer maps ServiceOverloaded to 503 + Retry-After."""
    from page_segmentation_tpu.inference.server import ServiceOverloaded

    orig_submit = service.submit

    def rejecting(*a, **kw):
        service.stats.rejected_total += 1
        raise ServiceOverloaded("5 pages pending (max_queue=4)")

    service.submit = rejecting
    try:
        with pytest.raises(urllib.error.HTTPError) as err:
            _post_png(server.port, make_page(9))
        assert err.value.code == 503
        assert err.value.headers.get("Retry-After") == "1"
        assert "max_queue" in json.loads(err.value.read())["error"]
    finally:
        service.submit = orig_submit


def test_stop_fails_pending_futures():
    """stop() with accepted-but-unfinished work must fail those futures
    promptly (not leave clients blocked until request timeout) and
    release their in-flight capacity."""
    import time

    network = PixelClassifier(n_classes=3, seed=0)
    predictor = Predictor(
        PredictSettings(color_map=DEFAULT_IMAGE_MAP, n_classes=3),
        network=network,
    )
    svc = BatchingService(
        predictor, DEFAULT_IMAGE_MAP, target_line_height=8,
        default_char_height=8, max_batch=1, max_wait_ms=1.0,
        prepare="spline",
    )
    gate = threading.Event()
    orig = predictor.predict_dataset_fast

    def gated(dataset, batch_size=1, **kw):
        gate.wait(timeout=60)
        yield from orig(dataset, batch_size=batch_size, **kw)

    predictor.predict_dataset_fast = gated
    try:
        futures = [svc.submit(make_page(i)) for i in range(4)]
        time.sleep(0.3)  # let the pipeline fill (device thread gated)
        gate.set()  # release the in-flight batch; the rest get stopped
        svc.stop()
        outcomes = []
        for f in futures:
            try:
                outcomes.append(("ok", f.result(timeout=30)))
            except RuntimeError as exc:
                assert "service stopped" in str(exc)
                outcomes.append(("stopped", None))
        # nothing may hang; at least the tail must have been failed fast
        assert len(outcomes) == 4
        assert svc._pending_pages == 0, svc._pending_pages
    finally:
        gate.set()
        predictor.predict_dataset_fast = orig
