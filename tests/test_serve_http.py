"""HTTP serving front-end (si_mamba_tpu/serve_http.py): concurrent clients'
single-cloud requests must coalesce through the MicroBatcher into batched
dispatches, with correct per-request responses over both wire formats."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from si_mamba_tpu.serve_http import make_server, shutdown_server


def _start(fn, **kw):
    server = make_server(fn, port=0, **kw)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address
    return server, f"http://{host}:{port}"


def _post(url, data, content_type):
    req = urllib.request.Request(f"{url}/predict", data=data,
                                 headers={"Content-Type": content_type})
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_http_predict_both_formats_and_health():
    def fn(batch):  # (b, N, 3) -> (b, 4): prob mass on int(mean) % 4
        idx = (batch.mean(axis=(1, 2)) * 0).astype(int)
        out = np.full((len(batch), 4), 0.1, np.float64)
        out[np.arange(len(batch)), idx + 2] = 0.7
        return out

    server, url = _start(fn, max_batch=4, max_delay_ms=2)
    try:
        cloud = np.zeros((16, 3), np.float32)
        r1 = _post(url, _npy_bytes(cloud), "application/octet-stream")
        assert r1["label"] == 2 and len(r1["probs"]) == 4
        r2 = _post(url, json.dumps({"points": cloud.tolist()}).encode(),
                   "application/json")
        assert r2 == r1

        with urllib.request.urlopen(f"{url}/healthz", timeout=60) as r:
            h = json.loads(r.read())
        assert h["ok"] and h["n_requests"] == 2
    finally:
        shutdown_server(server)


def test_http_concurrent_requests_coalesce():
    """8 concurrent clients against a fn gated on its first call: the
    requests queued during call 1 must land in >=2-sized batches."""
    entered, release = threading.Event(), threading.Event()
    sizes = []

    def fn(batch):
        sizes.append(len(batch))
        entered.set()
        release.wait(timeout=30)
        return np.tile(batch.sum(axis=(1, 2))[:, None], (1, 2))

    server, url = _start(fn, max_batch=8, max_delay_ms=50)
    try:
        rng = np.random.default_rng(0)
        clouds = [rng.standard_normal((8, 3)).astype(np.float32)
                  for _ in range(8)]
        results = [None] * 8

        def client(i):
            results[i] = _post(url, _npy_bytes(clouds[i]),
                               "application/octet-stream")

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        assert entered.wait(timeout=30)
        release.set()
        for t in threads:
            t.join(timeout=60)

        for i, r in enumerate(results):
            assert r is not None, i
            np.testing.assert_allclose(r["probs"][0], clouds[i].sum(),
                                       rtol=1e-4)
        assert sum(sizes) == 8
        assert max(sizes) >= 2, sizes  # coalescing actually happened
    finally:
        shutdown_server(server)


def test_http_error_paths():
    server, url = _start(lambda b: 1 / 0, max_batch=2, max_delay_ms=1)
    try:
        # malformed body -> 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, b"not a cloud", "application/octet-stream")
        assert e.value.code == 400
        # wrong shape -> 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, _npy_bytes(np.zeros((4, 2), np.float32)),
                  "application/octet-stream")
        assert e.value.code == 400
        # fn raising -> 500 with the exception name
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, _npy_bytes(np.zeros((4, 3), np.float32)),
                  "application/octet-stream")
        assert e.value.code == 500
        assert "ZeroDivisionError" in json.loads(e.value.read())["error"]
        # unknown route -> 404
        with pytest.raises(urllib.error.HTTPError) as e:
            with urllib.request.urlopen(f"{url}/nope", timeout=60):
                pass
        assert e.value.code == 404
    finally:
        shutdown_server(server)


def test_http_with_real_predictor():
    from tests.test_serving import _small_predictor

    p, _, _ = _small_predictor(max_batch=4)
    server, url = _start(p.predict_proba, max_batch=4, max_delay_ms=10)
    try:
        rng = np.random.default_rng(5)
        clouds = rng.standard_normal((3, 128, 3)).astype(np.float32)
        got = [_post(url, _npy_bytes(c), "application/octet-stream")
               for c in clouds]
        want = p.predict_proba(clouds)
        for i, r in enumerate(got):
            assert r["label"] == int(want[i].argmax())
            np.testing.assert_allclose(r["probs"], want[i],
                                       rtol=1e-4, atol=1e-5)
    finally:
        shutdown_server(server)
