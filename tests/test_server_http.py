"""HTTP JSON endpoint over TaskServer: responses must match the in-process
server exactly; errors are 4xx JSON, stats count traffic."""

import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpg_tpu.serve import TaskServer
from cpg_tpu.server_http import serve_http
from cpg_tpu.train.manager import Manager
from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig

from .helpers import norm_augment, normalize01, synthetic_task, tiny_cnn


@pytest.fixture(scope="module")
def served():
    d1 = synthetic_task(0)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    start_task(state, "t1", d1["num_classes"], jax.random.PRNGKey(1))
    Manager(state, tiny_cnn, 1, d1, cfg, batch_size=32,
            lr_schedule="constant", augment_fn=norm_augment,
            preprocess_fn=normalize01).train(epochs=1)
    srv = TaskServer(state, preprocess_fn=normalize01,
                     compute_dtype=jnp.float32, min_bucket=8)
    httpd = serve_http(srv, port=0)  # ephemeral port
    yield srv, httpd, d1
    httpd.shutdown()


def _call(httpd, path, payload=None):
    url = f"http://127.0.0.1:{httpd.server_address[1]}{path}"
    if payload is None:
        req = urllib.request.Request(url)
    else:
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_http_predict_matches_inprocess(served):
    srv, httpd, d1 = served
    x = d1["test_x"][:5]
    got = _call(httpd, "/v1/predict",
                {"task_id": 1, "inputs": x.tolist()})
    want = srv.predict(1, x)
    np.testing.assert_allclose(np.array(got["logits"]), want,
                               rtol=1e-5, atol=1e-5)
    assert got["top1"] == np.argmax(want, -1).tolist()
    # single image (HWC) accepted too
    one = _call(httpd, "/v1/predict", {"task_id": 1,
                                       "inputs": x[0].tolist()})
    np.testing.assert_allclose(np.array(one["logits"]), want[:1],
                               rtol=1e-5, atol=1e-5)


def test_http_mixed_tasks_and_stats(served):
    srv, httpd, d1 = served
    x = d1["test_x"]
    out = _call(httpd, "/v1/predict_mixed",
                {"requests": [{"task_id": 1, "input": x[0].tolist()},
                              {"task_id": 1, "input": x[1].tolist()}]})
    want = srv.predict(1, x[:2])
    for i, r in enumerate(out["results"]):
        np.testing.assert_allclose(np.array(r["logits"]), want[i],
                                   rtol=1e-5, atol=1e-5)
    tasks = _call(httpd, "/v1/tasks")
    assert tasks["1"]["num_classes"] == d1["num_classes"]
    stats = _call(httpd, "/v1/stats")
    assert stats["requests"] >= 1 and stats["per_task"]["1"] >= 2


def test_http_errors(served):
    _, httpd, d1 = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _call(httpd, "/v1/predict", {"task_id": 1, "inputs": [[0, 1]]})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _call(httpd, "/v1/nope", {})
    assert e.value.code == 404


def test_http_latency_stats(served):
    _, httpd, d1 = served
    _call(httpd, "/v1/predict", {"task_id": 1,
                                 "inputs": d1["test_x"][:2].tolist()})
    lat = _call(httpd, "/v1/stats")["latency_ms"]
    assert lat["count"] >= 1 and lat["max"] >= lat["avg"] > 0


def test_http_dtype_canonical_per_shape(served):
    """Dtype is a function of the task shape, never of payload values
    (ADVICE r3 #1): float payloads arrive float32; 1-D (token-id) integer
    payloads arrive int32 whether or not they fit in a byte — identical
    shapes must hit ONE jit signature, since every (bucket, dtype) pair is
    a retrace costing minutes on the relay-backed TPU; integer image
    pixels above 255 are a 400 client error, not a silent wrap (numpy 1.x)
    or a handler-thread OverflowError (numpy 2.x)."""
    from cpg_tpu.server_http import _as_batch

    srv, httpd, d1 = served
    xf = (d1["test_x"][:2].astype(np.float32) / 255.0)
    got = _call(httpd, "/v1/predict", {"task_id": 1, "inputs": xf.tolist()})
    want = srv.predict(1, xf)
    np.testing.assert_allclose(np.array(got["logits"]), want,
                               rtol=1e-5, atol=1e-5)
    # text family: small and large ids land in the SAME dtype (no retrace)
    lo = _as_batch([[1, 2, 3, 4]], (4,))
    hi = _as_batch([[1, 2, 300, 4]], (4,))
    assert lo.dtype == hi.dtype == np.int32
    # image family: integer pixels are uint8, out-of-range is a client error
    assert _as_batch(d1["test_x"][:1].tolist(),
                     d1["test_x"].shape[1:]).dtype == np.uint8
    xi = d1["test_x"][:1].astype(np.int64) + 300
    with pytest.raises(urllib.error.HTTPError) as e:
        _call(httpd, "/v1/predict", {"task_id": 1, "inputs": xi.tolist()})
    assert e.value.code == 400
    assert "uint8" in json.loads(e.value.read())["error"]


def test_http_mixed_rejects_batch_input(served):
    """predict_mixed entries are ONE example each; a batch in 'input' must be
    a 400, not a silent [0] truncation."""
    _, httpd, d1 = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _call(httpd, "/v1/predict_mixed",
              {"requests": [{"task_id": 1,
                             "input": d1["test_x"][:3].tolist()}]})
    assert e.value.code == 400
    assert "ONE example" in json.loads(e.value.read())["error"]


def test_http_stats_count_per_request(served):
    """requests/latency count once per HTTP request; images per item."""
    _, httpd, d1 = served
    before = _call(httpd, "/v1/stats")
    _call(httpd, "/v1/predict_mixed",
          {"requests": [{"task_id": 1, "input": d1["test_x"][0].tolist()},
                        {"task_id": 1, "input": d1["test_x"][1].tolist()}]})
    after = _call(httpd, "/v1/stats")
    assert after["requests"] == before["requests"] + 1
    assert after["images"] == before["images"] + 2
    assert after["latency_ms"]["count"] == before["latency_ms"]["count"] + 1


def test_http_shutdown_closes_batcher(served):
    """httpd.shutdown() must stop DynamicBatcher worker threads (they
    otherwise poll forever and pin the TaskServer alive)."""
    import time

    srv, _, d1 = served
    from cpg_tpu.server_http import serve_http as _serve

    httpd = _serve(srv, port=0, batch_window_ms=2.0)
    try:
        _call(httpd, "/v1/predict", {"task_id": 1,
                                     "inputs": d1["test_x"][0].tolist()})
        assert httpd.batcher._threads  # a worker exists
    finally:
        httpd.shutdown()
    deadline = time.time() + 5
    while time.time() < deadline and any(
            t.is_alive() for t in httpd.batcher._threads.values()):
        time.sleep(0.05)
    assert not any(t.is_alive() for t in httpd.batcher._threads.values())
