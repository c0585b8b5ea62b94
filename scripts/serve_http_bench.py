"""HTTP serving throughput: dynamic micro-batching vs per-request dispatch.

Spins the real ThreadingHTTPServer (mvae_tpu/serve_http.py) on localhost,
fires C concurrent clients x R requests each at /embed (batch-of-`--rows`
float32 images over the binary wire format), and reports aggregate
requests/sec, per-request p50/p95 latency, and how many device calls the
micro-batcher actually issued. Comparing `--window-ms 0.0` (effectively
per-request dispatch) against the default window shows what coalescing
buys on this host, where every device call pays the ~40-90 ms tunnel
readback.

Run: python scripts/serve_http_bench.py [--clients 16] [--requests 8]
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ""))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np                                             # noqa: E402


def _warm_buckets(sampler, max_rows):
    """Compile every power-of-two embed bucket that a drained batch could
    hit, so the timed region measures steady-state serving, not compiles."""
    m = 1
    while m <= max_rows:
        sampler.embed({"image": np.zeros((m, 784), np.float32)})
        m *= 2
    sampler.embed({"image": np.zeros((m, 784), np.float32)})


def bench_one(sampler, window_ms, clients, requests, rows, transport="http"):
    from mvae_tpu.serve_http import ServeApp, make_server, encode_array
    _warm_buckets(sampler, clients * rows)
    app = ServeApp(sampler, window_ms=window_ms)
    srv = make_server(app, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    rng = np.random.default_rng(0)
    x = rng.random((rows, 784), np.float32)
    payload = {"inputs": {"image": encode_array(x, binary=True)},
               "binary": True}
    body = json.dumps(payload).encode()

    def post_http():
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/embed", data=body,
            headers={"Content-Type": "application/json"})
        for attempt in range(3):
            try:
                with urllib.request.urlopen(req, timeout=300) as r:
                    json.load(r)
                return
            except (ConnectionResetError, ConnectionRefusedError):
                if attempt == 2:
                    raise
                time.sleep(0.05)

    def post_app():
        status, _ = app.handle("POST", "/embed", payload)
        assert status == 200

    post = post_http if transport == "http" else post_app
    post()                                    # warm the path
    lat = []
    lock = threading.Lock()

    def client():
        for _ in range(requests):
            t0 = time.perf_counter()
            post()
            dt = (time.perf_counter() - t0) * 1e3
            with lock:
                lat.append(dt)

    base_calls = app._batcher.device_calls
    threads = [threading.Thread(target=client) for _ in range(clients)]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0
    calls = app._batcher.device_calls - base_calls
    n = clients * requests
    lat.sort()
    out = {
        "mode": transport,
        "window_ms": window_ms,
        "requests": n,
        "wall_s": round(wall, 3),
        "req_per_s": round(n / wall, 1),
        "p50_ms": round(lat[n // 2], 1),
        "p95_ms": round(lat[min(int(n * 0.95), len(lat) - 1)], 1),
        "device_calls": calls,
        "mean_rows_per_call": round(n * rows / max(calls, 1), 1),
    }
    srv.shutdown()
    srv.server_close()
    app.close()
    return out


def bench_direct(sampler, clients, requests, rows):
    """No batcher, no HTTP: every request is its own device call (what a
    naive server would do) — the baseline dynamic batching is judged
    against."""
    rng = np.random.default_rng(0)
    x = rng.random((rows, 784), np.float32)
    _warm_buckets(sampler, rows)
    lat, lock = [], threading.Lock()

    def client():
        for _ in range(requests):
            t0 = time.perf_counter()
            mu, _ = sampler.embed({"image": x})
            np.asarray(mu)                      # fetch = hard fence
            dt = (time.perf_counter() - t0) * 1e3
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=client) for _ in range(clients)]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0
    n = clients * requests
    lat.sort()
    return {"mode": "direct-per-request", "requests": n,
            "wall_s": round(wall, 3), "req_per_s": round(n / wall, 1),
            "p50_ms": round(lat[n // 2], 1),
            "p95_ms": round(lat[min(int(n * 0.95), n - 1)], 1),
            "device_calls": n, "mean_rows_per_call": float(rows)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--rows", type=int, default=1)
    ap.add_argument("--windows", type=float, nargs="+",
                    default=[0.0, 2.0, 10.0])
    ns = ap.parse_args()

    from mvae_tpu.serve import Sampler
    if ns.checkpoint:
        from mvae_tpu.models import model_ctor
        sampler = Sampler.from_checkpoint(ns.checkpoint, model_ctor("mnist"))
    else:
        import jax
        from mvae_tpu.models.mnist import MnistMVAE
        model = MnistMVAE(64)
        params, state = model.init(jax.random.key(0))
        sampler = Sampler(model, params, state)

    print(f"clients={ns.clients} requests/client={ns.requests} "
          f"rows/request={ns.rows}", flush=True)
    print(json.dumps(bench_direct(sampler, ns.clients, ns.requests,
                                  ns.rows)), flush=True)
    for w in ns.windows:
        for transport in ("app", "http"):
            r = bench_one(sampler, w, ns.clients, ns.requests, ns.rows,
                          transport=transport)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
