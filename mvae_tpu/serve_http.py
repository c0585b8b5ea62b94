"""HTTP serving front-end with dynamic micro-batching.

The reference's only inference surface is the offline sample.py scripts;
`mvae_tpu.serve.Sampler` wraps a checkpoint in compiled in-process
endpoints. This module puts a production-style network front on them:

    python -m mvae_tpu.serve_http --family mnist \
        --checkpoint trained_models/model_best.msgpack --port 8700

Endpoints (JSON request/response):

    GET  /healthz      liveness + model identity
    GET  /stats        request counts, device-call counts, batch histogram
    POST /sample       {"n": 4, "seed": 0, "condition": {"text": 3}}
    POST /embed        {"inputs": {"image": [...]}}  -> {"mu", "logvar"}
    POST /reconstruct  {"inputs": {"image": [...]}}  -> all modalities

Arrays travel as nested JSON lists, or as
`{"b64": <base64>, "dtype": "float32", "shape": [...]}` for bulk data;
set `"binary": true` in a request to get responses in that form too.

**Dynamic micro-batching**: concurrent `/embed` and `/reconstruct`
requests with the same modality set are coalesced — a request parks up
to `--window-ms` while the batcher drains the queue, concatenates the
inputs, runs ONE padded bucketed device call, and scatters the slices
back. Under concurrency the device sees one launch per window instead
of one per request (the standard dynamic-batching pattern of production
model servers); a lone request pays at most the window. `/sample` calls
are served directly: their cost is dominated by decode and conditions
rarely coincide.

Multi-chip: `--dp N` serves over an N-device data-parallel mesh — the
same jitted endpoints with params replicated and request batches
sharded over "data" (`Sampler(mesh=...)`, values equal to single-device,
tested on the virtual 8-device mesh); the HTTP layer is unchanged.
"""

import argparse
import base64
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


# ---------------------------------------------------------------------------
# wire format
# ---------------------------------------------------------------------------


def decode_array(obj, dtype=None):
    """JSON value -> numpy array. Accepts nested lists, scalars, or the
    binary envelope {"b64", "dtype", "shape"}."""
    if isinstance(obj, dict):
        raw = base64.b64decode(obj["b64"])
        a = np.frombuffer(raw, dtype=np.dtype(obj["dtype"]))
        return a.reshape(obj["shape"]).copy()
    a = np.asarray(obj)
    if dtype is not None and a.dtype != dtype:
        a = a.astype(dtype)
    return a


def encode_array(a, binary=False):
    a = np.asarray(a)
    if binary:
        return {"b64": base64.b64encode(np.ascontiguousarray(a)).decode(),
                "dtype": str(a.dtype), "shape": list(a.shape)}
    return a.tolist()


# ---------------------------------------------------------------------------
# dynamic micro-batcher
# ---------------------------------------------------------------------------


class _Pending:
    __slots__ = ("inputs", "n", "event", "result", "error")

    def __init__(self, inputs, n):
        self.inputs = inputs
        self.n = n
        self.event = threading.Event()
        self.result = None
        self.error = None


class MicroBatcher:
    """Coalesce concurrent requests keyed by (endpoint, modality set).

    submit() parks the calling thread; a single drain thread wakes every
    `window_s`, concatenates all parked inputs per key along the batch
    axis (up to max_batch rows per device call), runs `fns[endpoint]`
    once, and scatters row slices back to the callers.
    """

    def __init__(self, fns, window_s=0.002, max_batch=256, pipeline=4):
        self.fns = fns
        self.window_s = window_s
        self.max_batch = max_batch
        self._lock = threading.Condition()
        self._queues = {}          # key -> [_Pending]
        self._stop = False
        self.device_calls = 0
        self.batched_requests = 0
        self.batch_sizes = []      # rows per device call (bounded)
        self._stats_lock = threading.Lock()
        # successive drained batches run on a small pool so device calls
        # PIPELINE (dispatch N+1 while N's result is still in flight /
        # being fetched) instead of serializing on the drain thread —
        # batching then reduces call count without capping throughput at
        # 1/per-call-latency
        from concurrent.futures import ThreadPoolExecutor
        self._pool = ThreadPoolExecutor(max_workers=max(1, pipeline),
                                        thread_name_prefix="mb")
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, endpoint, names, inputs):
        """inputs: dict name -> (n, ...) numpy. Returns the result for
        exactly these n rows."""
        n = next(iter(inputs.values())).shape[0]
        p = _Pending(inputs, n)
        with self._lock:
            if self._stop:
                raise RuntimeError("MicroBatcher is closed")
            self._queues.setdefault((endpoint, names), []).append(p)
            self._lock.notify()
        p.event.wait()
        if p.error is not None:
            raise p.error
        return p.result

    def close(self):
        with self._lock:
            self._stop = True
            self._lock.notify()
        self._thread.join(timeout=5)
        self._pool.shutdown(wait=True)

    def _loop(self):
        while True:
            with self._lock:
                while not self._queues and not self._stop:
                    self._lock.wait()
                if not self._stop:
                    # collect for one window so concurrent arrivals land
                    # in this drain, then take the whole backlog
                    self._lock.wait(self.window_s)
                queues, self._queues = self._queues, {}
            futures = []
            for (endpoint, names), pend in queues.items():
                i = 0
                while i < len(pend):
                    group, rows = [], 0
                    while i < len(pend) and (
                            not group or rows + pend[i].n <= self.max_batch):
                        group.append(pend[i])
                        rows += pend[i].n
                        i += 1
                    futures.append(self._pool.submit(
                        self._run_group, endpoint, names, group, rows))
            if self._stop:
                for f in futures:
                    f.result()
                return

    def _run_group(self, endpoint, names, group, rows):
        try:
            joined = {k: np.concatenate([p.inputs[k] for p in group])
                      for k in group[0].inputs}
            out = self.fns[endpoint](names, joined)
            with self._stats_lock:
                self.device_calls += 1
                self.batched_requests += len(group)
                if len(self.batch_sizes) < 10000:
                    self.batch_sizes.append(rows)
            off = 0
            for p in group:
                p.result = _slice_tree(out, off, off + p.n)
                off += p.n
        except Exception as e:              # deliver, don't kill the pool
            for p in group:
                p.error = e
        finally:
            for p in group:
                p.event.set()


def _slice_tree(out, lo, hi):
    if isinstance(out, dict):
        return {k: _slice_tree(v, lo, hi) for k, v in out.items()}
    if isinstance(out, tuple):
        return tuple(_slice_tree(v, lo, hi) for v in out)
    return out[lo:hi]


# ---------------------------------------------------------------------------
# the app
# ---------------------------------------------------------------------------


class ServeApp:
    """Routes + stats around a Sampler; transport-agnostic (the test suite
    drives it through HTTP, but handle() is callable directly)."""

    def __init__(self, sampler, window_ms=2.0, max_batch=256):
        self.sampler = sampler
        spec = sampler.model.input_spec()
        self._dtypes = {k: np.dtype(v[1]) for k, v in spec.items()}
        self._t0 = time.time()
        self.requests = 0
        self._batcher = MicroBatcher(
            {"embed": self._embed_batch, "reconstruct": self._recon_batch},
            window_s=window_ms / 1000.0, max_batch=max_batch)

    def _embed_batch(self, names, joined):
        mu, logvar = self.sampler.embed(joined)
        return {"mu": np.asarray(mu), "logvar": np.asarray(logvar)}

    def _recon_batch(self, names, joined):
        out = self.sampler.reconstruct(joined)
        return {k: np.asarray(v) for k, v in out.items()}

    def close(self):
        self._batcher.close()

    # -- endpoints ---------------------------------------------------------

    def handle(self, method, path, body):
        """Returns (status, payload dict)."""
        self.requests += 1
        if method == "GET" and path == "/healthz":
            m = self.sampler.model
            return 200, {"status": "ok",
                         "model": type(m).__name__,
                         "n_latents": int(m.n_latents),
                         "modalities": list(m.modalities),
                         "uptime_s": round(time.time() - self._t0, 3)}
        if method == "GET" and path == "/stats":
            b = self._batcher
            sizes = b.batch_sizes
            return 200, {"requests": self.requests,
                         "device_calls": b.device_calls,
                         "batched_requests": b.batched_requests,
                         "mean_batch_rows": (float(np.mean(sizes))
                                             if sizes else 0.0),
                         "max_batch_rows": int(max(sizes)) if sizes else 0}
        if method != "POST":
            return 404, {"error": f"no route {method} {path}"}
        try:
            if path == "/sample":
                return 200, self._sample(body or {})
            if path in ("/embed", "/reconstruct"):
                return 200, self._batched(path[1:], body or {})
        except KeyError as e:
            return 400, {"error": f"missing field {e}"}
        except ValueError as e:
            return 400, {"error": str(e)}
        return 404, {"error": f"no route {method} {path}"}

    def _inputs(self, body):
        raw = body["inputs"]
        if not raw:
            raise ValueError("inputs must name at least one modality")
        inputs = {}
        for k, v in raw.items():
            if k not in self._dtypes:
                raise ValueError(f"unknown modality {k!r}")
            a = decode_array(v, self._dtypes[k])
            want = self.sampler.model.input_spec()[k][0]
            if a.shape[1:] != tuple(want):
                raise ValueError(
                    f"{k}: expected (n, {', '.join(map(str, want))}), "
                    f"got {a.shape}")
            inputs[k] = a
        ns = {v.shape[0] for v in inputs.values()}
        if len(ns) != 1:
            raise ValueError(f"ragged batch sizes {sorted(ns)}")
        return inputs

    def _sample(self, body):
        n = int(body.get("n", 1))
        if not 1 <= n <= 4096:
            raise ValueError("n must be in [1, 4096]")
        cond = body.get("condition") or None
        if cond:
            dec = {}
            for k, v in cond.items():
                if k not in self._dtypes:
                    raise ValueError(f"unknown modality {k!r}")
                a = decode_array(v, self._dtypes[k])
                want = tuple(self.sampler.model.input_spec()[k][0])
                if a.shape == want:          # allow unbatched condition
                    a = a[None]
                dec[k] = a
            cond = dec
        out = self.sampler.sample(n=n, condition=cond,
                                  seed=int(body.get("seed", 0)))
        binary = bool(body.get("binary"))
        return {k: encode_array(v, binary) for k, v in out.items()}

    def _batched(self, endpoint, body):
        inputs = self._inputs(body)
        names = tuple(sorted(inputs))
        out = self._batcher.submit(endpoint, names, inputs)
        binary = bool(body.get("binary"))
        return {k: encode_array(v, binary) for k, v in out.items()}


# ---------------------------------------------------------------------------
# HTTP transport
# ---------------------------------------------------------------------------


def make_server(app, host="127.0.0.1", port=0):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, status, payload):
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            status, payload = app.handle("GET", self.path, None)
            self._reply(status, payload)

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                self._reply(400, {"error": "invalid JSON body"})
                return
            status, payload = app.handle("POST", self.path, body)
            self._reply(status, payload)

        def log_message(self, *a):       # quiet by default
            pass

    class Server(ThreadingHTTPServer):
        # default accept backlog (5) drops connections under a concurrent
        # client burst — exactly the traffic micro-batching is for
        request_queue_size = 128
        daemon_threads = True

    return Server((host, port), Handler)


def main(argv=None):
    from mvae_tpu.models import model_ctor
    from mvae_tpu.serve import Sampler

    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--family", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8700)
    ap.add_argument("--window-ms", type=float, default=2.0,
                    help="micro-batching window for /embed and /reconstruct")
    ap.add_argument("--max-batch", type=int, default=256)
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip precompiling endpoint graphs at startup")
    ap.add_argument("--cache-dir", default=None,
                    help="persistent compilation cache directory")
    ap.add_argument("--dp", type=int, default=1,
                    help="serve over the first N devices (data-parallel "
                         "mesh; batch buckets round up to a multiple of N)")
    ns = ap.parse_args(argv)

    mesh = None
    if ns.dp > 1:
        from mvae_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(ns.dp)
        print(f"serving over a {ns.dp}-device data-parallel mesh",
              flush=True)
    sampler = Sampler.from_checkpoint(ns.checkpoint, model_ctor(ns.family),
                                      cache_dir=ns.cache_dir, mesh=mesh)
    if not ns.no_warmup:
        t = time.time()
        print("warming up endpoint graphs ...", flush=True)
        sampler.warmup()
        print(f"warmup done in {time.time() - t:.1f}s", flush=True)
    app = ServeApp(sampler, window_ms=ns.window_ms, max_batch=ns.max_batch)
    srv = make_server(app, ns.host, ns.port)
    print(f"serving {ns.family} on http://{ns.host}:{srv.server_address[1]}",
          flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        app.close()
        srv.server_close()


if __name__ == "__main__":
    main()
