"""Isolated BN+swish fwd+bwd: Pallas fused kernels vs XLA's jnp form
vs MXU matmul moments (MVAE_BN_MXU_MOMENTS — nn/norm.py).

Times a jitted loss-grad of sum(bn_swish(x)^2) over the celeba/vision
activation shapes (per-term decoder/encoder tensors) with hard readback
fences. Run on the real TPU:

    python scripts/bn_kernel_bench.py [--iters 50] [--bf16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402
import numpy as np                                             # noqa: E402

from mvae_tpu.nn.layers import swish                           # noqa: E402
from mvae_tpu.nn.norm import batchnorm_apply                   # noqa: E402
from mvae_tpu.ops.bn_pallas import bn_swish_train              # noqa: E402

SHAPES = [                       # (label, shape): celeba B=100 activations
    ("enc L1", (100, 32, 32, 32)),
    ("enc L2", (100, 16, 16, 64)),
    ("enc L3", (100, 8, 8, 128)),
    ("enc L4", (100, 5, 5, 256)),
    ("dec L1x3T", (3, 100, 8, 8, 128)),     # vmapped over 3 terms
    ("dec L2x3T", (3, 100, 16, 16, 64)),
    ("dec L3x3T", (3, 100, 32, 32, 32)),
]


def _jnp_form(x, scale, bias):
    params = {"scale": scale, "bias": bias}
    state = {"mean": jnp.zeros_like(scale), "var": jnp.ones_like(scale)}
    y, _ = batchnorm_apply(params, state, x.astype(jnp.float32), train=True)
    return swish(y.astype(x.dtype))


def _mxu_form(x, scale, bias):
    # same jnp form, but forward moments as ones-vector matmuls
    os.environ["MVAE_BN_MXU_MOMENTS"] = "1"
    try:
        return _jnp_form(x, scale, bias)
    finally:
        os.environ["MVAE_BN_MXU_MOMENTS"] = "0"


def bench(fn, x, scale, bias, iters):
    loss = lambda xx: jnp.sum(fn(xx, scale, bias).astype(jnp.float32) ** 2)
    if x.ndim == 5:
        inner = loss
        loss = lambda xx: jnp.sum(jax.vmap(
            lambda xt: inner(xt))(xx))
    g = jax.jit(jax.grad(loss))
    r = g(x)
    float(jnp.sum(r))                       # compile + fence
    t0 = time.perf_counter()
    for _ in range(iters):
        r = g(x)
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / iters * 1e6   # us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--bf16", action="store_true")
    ns = ap.parse_args()
    dtype = jnp.bfloat16 if ns.bf16 else jnp.float32
    rng = np.random.default_rng(0)
    fused = lambda xx, s, b: bn_swish_train(xx, s, b)[0]
    print(f"{'shape':12s} {'xla us':>10s} {'pallas us':>10s} "
          f"{'mxu us':>10s}   winner")
    for label, shape in SHAPES:
        c = shape[-1]
        x = jnp.asarray(rng.normal(0, 1, shape), dtype)
        scale = jnp.asarray(rng.normal(1, 0.1, (c,)), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
        tx = bench(_jnp_form, x, scale, bias, ns.iters)
        tp = bench(fused, x, scale, bias, ns.iters)
        tm = bench(_mxu_form, x, scale, bias, ns.iters)
        best = min(tx, tp, tm)
        win = {tx: "xla", tp: "pallas", tm: "mxu"}[best]
        print(f"{label:12s} {tx:10.1f} {tp:10.1f} {tm:10.1f}   {win}",
              flush=True)


if __name__ == "__main__":
    main()
