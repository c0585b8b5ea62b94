"""Throughput rows for all six families in one command.

Measures the production full-optimizer-step path (device-resident data,
K-step lax.scan per dispatch, dead-backward elimination / exact skips /
expert gather as each family's driver configures them) with HARD host
fences (a float() readback per window — block_until_ready alone is
unreliable over this environment's tunneled backend, BASELINE.md).

Run on the real TPU:  python scripts/bench_families.py [--k 100]
                      [--families mnist,celeba,...]
Rows land in BASELINE.md / README.md by hand — this script is the one
source for re-measuring them.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402
import numpy as np                                             # noqa: E402
import optax                                                   # noqa: E402

from mvae_tpu.train.loop import make_multi_train_step          # noqa: E402


def _mnist_family(flat):
    def build(rng, dtype):
        from mvae_tpu.models.mnist import MnistMVAE
        from mvae_tpu.models.fashionmnist import FashionMnistMVAE
        if flat:
            model = MnistMVAE(64, compute_dtype=dtype or jnp.float32)
        else:
            model = FashionMnistMVAE(64, compute_dtype=dtype)
        shape = (784,) if flat else (28, 28, 1)
        data = {
            "image": (rng.random((1, 2000) + shape) * 255).astype(np.uint8),
            "text": (rng.integers(0, 10, (1, 2000))).astype(np.int32),
        }
        masks = [[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]
        lambdas = [[1.0, 10.0]] * 3
        return model, data, masks, lambdas, {}
    return build


def _multimnist(rng, dtype):
    from mvae_tpu.models.multimnist import MultiMnistMVAE
    model = MultiMnistMVAE(64, compute_dtype=dtype)
    data = {
        "image": (rng.random((1, 2000, 50, 50, 1)) * 255).astype(np.uint8),
        "text": rng.integers(0, 12, (1, 2000, 4)).astype(np.int32),
    }
    return (model, data, [[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]],
            [[1.0, 10.0]] * 3, {})


def _celeba(rng, dtype):
    from mvae_tpu.models.celeba import CelebaMVAE, N_ATTRS
    model = CelebaMVAE(100, compute_dtype=dtype)
    data = {
        "image": (rng.random((1, 2000, 64, 64, 3)) * 255).astype(np.uint8),
        "attrs": (rng.random((1, 2000, N_ATTRS)) < 0.3).astype(np.float32),
    }
    return (model, data, [[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]],
            [[1.0, 10.0]] * 3, {})


def _celeba19(rng, dtype):
    from mvae_tpu.models.celeba19 import Celeba19MVAE, N_ATTRS
    from mvae_tpu.core.subsets import (celeba19_step_terms,
                                       celeba19_recon_support)
    model = Celeba19MVAE(100, compute_dtype=dtype)
    data = {
        "image": (rng.random((1, 2000, 64, 64, 3)) * 255).astype(np.uint8),
        "attrs": (rng.random((1, 2000, N_ATTRS)) < 0.3).astype(np.float32),
    }
    mk, lk = celeba19_step_terms(np.random.default_rng(1), 1, N_ATTRS,
                                 1.0, 10.0)
    return model, data, mk, lk, {
        "dynamic": True, "recon_support": celeba19_recon_support(1, N_ATTRS)}


def _vision(rng, dtype):
    from mvae_tpu.models.vision import VisionMVAE, MODALITIES, CHANNELS
    model = VisionMVAE(100, compute_dtype=dtype)
    data = {m: (rng.random((1, 500, 64, 64, CHANNELS[m]))
                * 255).astype(np.uint8) for m in MODALITIES}
    masks = np.concatenate([np.ones((1, 6), np.float32),
                            np.eye(6, dtype=np.float32)])
    lambdas = np.full((7, 6), 1.0 / 6.0, np.float32)
    return model, data, masks, lambdas, {
        "recon_masks": np.ones((7, 6), np.float32), "batch": 50}


FAMILIES = {
    "mnist": _mnist_family(True),
    "fashionmnist": _mnist_family(False),
    "multimnist": _multimnist,
    "celeba": _celeba,
    "celeba19": _celeba19,
    "vision": _vision,
}


def bench_family(name, k, reps=3, dtype=None, want_flops=False, fast=False):
    if name == "celeba19" and dtype is not None and not fast:
        # match the production CLI default (experiments/celeba19/train.py:
        # apply_bf16_loss_default — bf16 BCE elementwise math, gate row
        # celeba19@bf16@dec@bf16loss; not applied under fast mode)
        os.environ.setdefault("MVAE_BF16_LOSS", "1")
    rng = np.random.default_rng(0)
    model, data, masks, lambdas, opts = FAMILIES[name](rng, dtype)
    B = opts.get("batch", 100)
    dynamic = opts.get("dynamic", False)
    tx = optax.adam(1e-4)
    params, state = model.init(jax.random.key(0))
    opt_state = tx.init(params)
    data = {kk: jax.device_put(v) for kk, v in data.items()}
    n = next(iter(data.values())).shape[1]
    idxs = jnp.asarray(rng.integers(0, n, (k, 1, B)), jnp.int32)
    betas = jnp.full((k,), 0.5, jnp.float32)
    extra = ()
    if dynamic:
        multi = make_multi_train_step(
            model, tx, None, None, dynamic_masks=True,
            recon_support=opts.get("recon_support"),
            fast_skip_decode=fast)
        extra = (jnp.broadcast_to(jnp.asarray(masks, jnp.float32),
                                  (k,) + np.shape(masks)),
                 jnp.broadcast_to(jnp.asarray(lambdas, jnp.float32),
                                  (k,) + np.shape(lambdas)))
    else:
        multi = make_multi_train_step(
            model, tx, masks, lambdas,
            recon_masks=opts.get("recon_masks"))
    out = multi(params, state, opt_state, jax.random.key(6), data, idxs,
                betas, *extra)
    float(out[4][-1])                     # compile + warm, hard fence
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = multi(out[0], out[1], out[2], out[3], data, idxs, betas,
                    *extra)
        float(out[4][-1])
        times.append((time.perf_counter() - t0) / k)
    ms = np.asarray(times) * 1e3
    tag = ("bf16" if dtype is not None else "f32") + ("+fast" if fast else "")
    line = (f"{name:13s} {tag:4s} B={B:3d}: {ms.mean():8.3f} "
            f"+- {ms.std():.3f} ms/step ({1e3 / ms.mean():7.1f} steps/sec)")
    if want_flops:
        try:
            # XLA cost analysis counts a lax.scan body ONCE regardless of
            # trip count, so lower the SAME window at K=1: its count is
            # exactly one optimizer step (plus negligible prologue)
            extra1 = tuple(e[:1] for e in extra)
            cost = (multi.lower(params, state, opt_state, jax.random.key(6),
                                data, idxs[:1], betas[:1], *extra1)
                    .compile().cost_analysis())
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            gflops = float(cost["flops"]) / 1e9
            tf = gflops / ms.mean()       # GFLOP / ms == TFLOPs
            line += f"   {gflops:7.1f} GFLOP/step  {tf:6.2f} TFLOPs sustained"
        except Exception as e:            # cost analysis is best-effort
            line += f"   [flops unavailable: {type(e).__name__}]"
    print(line, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--families", type=str,
                    default=",".join(FAMILIES))
    ap.add_argument("--bf16", action="store_true",
                    help="compute in bfloat16 (params/losses stay f32)")
    ap.add_argument("--flops", action="store_true",
                    help="also report XLA-counted GFLOP/step and "
                         "sustained TFLOPs")
    ap.add_argument("--fast", action="store_true",
                    help="celeba19: bench the --fast-term-decode step "
                         "(skip image decode in image-absent terms)")
    ns = ap.parse_args()
    for name in ns.families.split(","):
        bench_family(name, ns.k,
                     dtype=jnp.bfloat16 if ns.bf16 else None,
                     want_flops=ns.flops, fast=ns.fast)


if __name__ == "__main__":
    main()
