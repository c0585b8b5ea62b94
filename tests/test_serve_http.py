"""HTTP serving front-end: wire format, batching, errors.

Covers ServeApp routing directly (transport-free) plus one real
ThreadingHTTPServer round-trip, and asserts the dynamic micro-batcher
actually coalesces concurrent requests into fewer device calls with
per-request results identical to direct Sampler calls.
"""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from mvae_tpu.data.mnist import synthetic_mnist
from mvae_tpu.models.mnist import MnistMVAE
from mvae_tpu.serve import Sampler
from mvae_tpu.serve_http import (ServeApp, MicroBatcher, make_server,
                                 decode_array, encode_array)


@pytest.fixture(scope="module")
def sampler():
    model = MnistMVAE(8)
    params, state = model.init(jax.random.key(0))
    return Sampler(model, params, state)


@pytest.fixture()
def app(sampler):
    a = ServeApp(sampler, window_ms=1.0)
    yield a
    a.close()


def _imgs(n, seed=0):
    imgs, _ = synthetic_mnist(n, seed=seed)
    return imgs.reshape(n, 784).astype(np.float32)


def test_wire_format_roundtrip():
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    assert decode_array(encode_array(a), np.float32).tolist() == a.tolist()
    env = encode_array(a, binary=True)
    b = decode_array(env)
    assert b.dtype == np.float32 and np.array_equal(a, b)


def test_healthz_stats_and_unknown_route(app):
    status, h = app.handle("GET", "/healthz", None)
    assert status == 200 and h["status"] == "ok"
    assert h["model"] == "MnistMVAE" and h["n_latents"] == 8
    assert sorted(h["modalities"]) == ["image", "text"]
    status, _ = app.handle("GET", "/nope", None)
    assert status == 404
    status, s = app.handle("GET", "/stats", None)
    assert status == 200 and s["requests"] >= 1


def test_embed_matches_direct(app, sampler):
    x = _imgs(3)
    status, out = app.handle("POST", "/embed",
                             {"inputs": {"image": x.tolist()}})
    assert status == 200
    mu, _lv = sampler.embed({"image": x})
    np.testing.assert_allclose(np.asarray(out["mu"]), np.asarray(mu),
                               rtol=1e-5, atol=1e-6)
    # binary response path is bit-exact
    status, out2 = app.handle("POST", "/embed",
                              {"inputs": {"image": encode_array(
                                  x, binary=True)}, "binary": True})
    assert status == 200
    np.testing.assert_allclose(decode_array(out2["mu"]), np.asarray(mu),
                               rtol=1e-6)


def test_reconstruct_matches_direct(app, sampler):
    x = _imgs(2, seed=3)
    status, out = app.handle("POST", "/reconstruct",
                             {"inputs": {"image": x.tolist()}})
    assert status == 200
    direct = sampler.reconstruct({"image": x})
    for k in ("image", "text"):
        np.testing.assert_allclose(np.asarray(out[k]),
                                   np.asarray(direct[k]),
                                   rtol=1e-5, atol=1e-6)


def test_sample_with_scalar_condition(app):
    status, out = app.handle("POST", "/sample",
                             {"n": 3, "seed": 5,
                              "condition": {"text": 4}})
    assert status == 200
    assert np.asarray(out["image"]).shape == (3, 784)
    status, out2 = app.handle("POST", "/sample", {"n": 3, "seed": 5,
                                                  "condition": {"text": 4}})
    np.testing.assert_array_equal(np.asarray(out["image"]),
                                  np.asarray(out2["image"]))


def test_request_validation(app):
    for body, frag in [
            ({"inputs": {}}, "at least one"),
            ({"inputs": {"nope": [[0.0]]}}, "unknown modality"),
            ({"inputs": {"image": [[0.0, 1.0]]}}, "expected"),
            ({"inputs": {"image": _imgs(2).tolist(),
                         "text": [1, 2, 3]}}, "ragged"),
            ({"n": 0}, "n must be"),
    ]:
        path = "/sample" if "n" in body else "/embed"
        status, out = app.handle("POST", path, body)
        assert status == 400, body
        assert frag in out["error"], out["error"]


def test_microbatching_coalesces_concurrent_requests(sampler):
    """16 concurrent /embed requests inside one 80 ms window must land in
    FEWER device calls (coalesced), and every caller must get exactly its
    own rows back."""
    app = ServeApp(sampler, window_ms=80.0)
    try:
        # one warm call so compile time doesn't eat the window
        app.handle("POST", "/embed", {"inputs": {"image": _imgs(1).tolist()}})
        base_calls = app._batcher.device_calls

        xs = [_imgs(2, seed=i) for i in range(16)]
        results = [None] * 16

        def hit(i):
            status, out = app.handle(
                "POST", "/embed",
                {"inputs": {"image": encode_array(xs[i], binary=True)},
                 "binary": True})
            assert status == 200
            results[i] = decode_array(out["mu"])

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        coalesced_calls = app._batcher.device_calls - base_calls
        assert coalesced_calls < 16, (
            f"no coalescing: {coalesced_calls} device calls for 16 requests")
        for i in range(16):
            mu, _ = sampler.embed({"image": xs[i]})
            np.testing.assert_allclose(results[i], np.asarray(mu),
                                       rtol=1e-5, atol=1e-6)
    finally:
        app.close()


def test_microbatcher_max_batch_and_errors():
    """Groups split at max_batch rows; an endpoint exception reaches every
    caller of the failed group instead of hanging or killing the loop."""
    calls = []

    def fn(names, joined):
        n = next(iter(joined.values())).shape[0]
        calls.append(n)
        if n == 0:
            raise ValueError("boom")
        return {"y": joined["x"] * 2}

    b = MicroBatcher({"f": fn}, window_s=0.05, max_batch=4)
    try:
        xs = [np.full((3, 2), i, np.float32) for i in range(4)]
        results = [None] * 4

        def hit(i):
            results[i] = b.submit("f", ("x",), {"x": xs[i]})

        ts = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        for i in range(4):
            np.testing.assert_array_equal(results[i]["y"], xs[i] * 2)
        assert max(calls) <= 4      # max_batch respected (3+3 > 4 splits)

        def bad():
            with pytest.raises(ValueError, match="boom"):
                b.submit("f", ("x",), {"x": np.zeros((0, 2), np.float32)})

        t = threading.Thread(target=bad)
        t.start()
        t.join(timeout=5)
        assert not t.is_alive(), "error was not delivered to the caller"
        # loop survives the exception
        out = b.submit("f", ("x",), {"x": np.ones((1, 2), np.float32)})
        np.testing.assert_array_equal(out["y"], np.full((1, 2), 2.0))
    finally:
        b.close()
    # submit after close fails fast instead of hanging forever
    with pytest.raises(RuntimeError, match="closed"):
        b.submit("f", ("x",), {"x": np.ones((1, 2), np.float32)})


def test_http_roundtrip(sampler):
    """Real sockets: spin the ThreadingHTTPServer on an ephemeral port and
    drive healthz + embed through urllib."""
    app = ServeApp(sampler, window_ms=1.0)
    srv = make_server(app, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert json.load(r)["status"] == "ok"
        x = _imgs(2)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/embed",
            data=json.dumps({"inputs": {"image": x.tolist()}}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            out = json.load(r)
        mu, _ = sampler.embed({"image": x})
        np.testing.assert_allclose(np.asarray(out["mu"]), np.asarray(mu),
                                   rtol=1e-5, atol=1e-6)
        # malformed JSON -> 400, served without killing the server
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/embed", data=b"{not json",
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 400
    finally:
        srv.shutdown()
        srv.server_close()
        app.close()
