"""Serving-endpoint latency on the real TPU.

Measures p50/p95 end-to-end latency (dispatch + device time + host readback
of the result — readback over this environment's tunnel is the dominant
term, ~40-90 ms for a fresh buffer; on a directly-attached chip the device
time is sub-ms) for the Sampler endpoints after their one-time bucket
compiles. Results land in BASELINE.md.

Run: python scripts/serve_latency.py [checkpoint.msgpack] [--model mnist]
(no checkpoint: trains a throwaway mnist model in-process first)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402
import numpy as np                                             # noqa: E402

from mvae_tpu.serve import Sampler                             # noqa: E402


def _quick_sampler():
    import optax
    from mvae_tpu.data.mnist import synthetic_mnist
    from mvae_tpu.models.mnist import MnistMVAE
    from mvae_tpu.train.loop import make_train_step
    model = MnistMVAE(64)
    params, state = model.init(jax.random.key(0))
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    step = make_train_step(model, tx, [[1., 1.], [1., 0.], [0., 1.]],
                           [[1., 10.]] * 3)
    imgs, labels = synthetic_mnist(512, seed=0)
    batch = {"image": jnp.asarray(imgs.reshape(512, 784)),
             "text": jnp.asarray(labels)}
    rng = jax.random.key(1)
    for _ in range(20):
        params, state, opt, rng, _, _ = step(params, state, opt, rng,
                                             batch, 0.1)
    return Sampler(model, params, state)


def measure(name, fn, reps=50):
    fn(0)                                 # bucket compile + warm
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = fn(i + 1)
        jax.tree_util.tree_map(np.asarray, out)   # fetch = hard fence
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    print(f"{name:34s} p50 {ts[len(ts) // 2]:7.2f} ms   "
          f"p95 {ts[int(len(ts) * 0.95)]:7.2f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--model", default="mnist")
    ns = ap.parse_args()
    if ns.checkpoint:
        import importlib
        mod = importlib.import_module(f"mvae_tpu.models.{ns.model}")
        ctor = next(getattr(mod, n) for n in dir(mod) if n.endswith("MVAE"))
        sampler = Sampler.from_checkpoint(ns.checkpoint, ctor)
    else:
        sampler = _quick_sampler()

    imgs = np.random.default_rng(0).random((64, 784), np.float32)
    measure("sample n=1 (unconditional)",
            lambda s: sampler.sample(n=1, seed=s))
    measure("sample n=64 (unconditional)",
            lambda s: sampler.sample(n=64, seed=s))
    measure("sample n=64 (condition text)",
            lambda s: sampler.sample(n=64, seed=s,
                                     condition={"text": jnp.asarray([3])}))
    measure("embed batch=1",
            lambda s: sampler.embed({"image": jnp.asarray(imgs[:1])}))
    measure("embed batch=64",
            lambda s: sampler.embed({"image": jnp.asarray(imgs)}))
    measure("reconstruct batch=64",
            lambda s: sampler.reconstruct({"image": jnp.asarray(imgs)}))


if __name__ == "__main__":
    main()
