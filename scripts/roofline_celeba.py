"""Roofline + trace analysis of the CelebA flagship training step.

Answers "where does the 1.8 ms single-chip step go?" with evidence
(BASELINE.md "Single-chip roofline + trace"):

  1. capture (or reuse) a jax.profiler trace of the production
     device-resident K-step window via the train CLI's --profile-dir;
  2. parse the xplane with jax.profiler.ProfileData: module wall time,
     per-op durations, category aggregation;
  3. XLA cost analysis of the single-step graph: FLOPs + the HLO-level
     "bytes accessed" upper bound, against v5e peaks.

Usage:
    python scripts/roofline_celeba.py [--trace-dir DIR] [--capture]

With --capture, runs a 1-epoch synthetic-data CelebA training with
--profile-dir DIR first (~6 min: dominated by the window compile).
"""

import argparse
import glob
import os
import re
import subprocess
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def capture(trace_dir):
    env = dict(os.environ)
    subprocess.run(
        [sys.executable, "experiments/celeba/train.py", "--epochs", "1",
         "--batch-size", "100", "--annealing-epochs", "1",
         "--n-latents", "100", "--log-interval", "20",
         "--profile-dir", trace_dir,
         "--out-dir", "/tmp/roofline_models",
         "--data-dir", "/tmp/roofline_no_data"],
        check=True, env=env,
        cwd=os.path.join(os.path.dirname(__file__), ".."))


def categorize(name):
    if name.startswith("%copy") or ".copy" in name:
        return "copies (prefetch waits / loop-carry / layout)"
    if "convolution" in name:
        return "convolution (unfused)"
    if "multiply_add_fusion" in name and re.search(
            r"= \(?f32\[4,4,|= \(?f32\[5,5,", name):
        return "conv weight-grad fusions (MXU)"
    if "multiply_reduce_fusion" in name:
        return "BN moment/grad reductions"
    if re.search(r"= \(?(f32|bf16)\[\d+,\d+,\d+,\d+\]", name) \
            and "fusion" in name:
        return "conv/deconv activation fusions (MXU)"
    if "dot" in name or re.search(
            r"\[6400,512\]|\[512,6400\]|\[100,512\]|\[300,", name):
        return "FC matmul fusions (MXU)"
    if "dynamic" in name or "gather" in name:
        return "gather/dynamic-slice"
    if "reduce" in name:
        return "other reductions"
    return "BN/EMA vector fusions + ELBO row-sums + misc elementwise"


def analyze_trace(trace_dir):
    from jax.profiler import ProfileData
    pbs = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not pbs:
        raise SystemExit(f"no xplane.pb under {trace_dir}; run --capture")
    p = ProfileData.from_file(pbs[-1])
    plane = [pl for pl in p.planes if "TPU" in pl.name][0]
    lines = {ln.name: list(ln.events) for ln in plane.lines}
    module_ms = sum(e.duration_ns for e in lines["XLA Modules"]) / 1e6
    n_steps = 20      # --log-interval of the capture = K window length
    print(f"module execution: {module_ms:.2f} ms "
          f"(K={n_steps} steps -> {module_ms / n_steps:.3f} ms/step)")
    evs = [e for e in lines["XLA Ops"] if not e.name.startswith("%while")]
    agg, cnt = defaultdict(float), defaultdict(int)
    for e in evs:
        c = categorize(e.name)
        agg[c] += e.duration_ns / 1e6
        cnt[c] += 1
    tot = sum(agg.values())
    print(f"{len(evs)} device op events ({len(evs) / n_steps:.0f} ops/step)")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {v / n_steps * 1e3:7.1f} us/step {100 * v / tot:5.1f}% "
              f"x{cnt[k] / n_steps:6.1f}/step  {k}")
    return module_ms / n_steps


def cost_roofline(ms_per_step):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from mvae_tpu.models.celeba import CelebaMVAE, N_ATTRS
    from mvae_tpu.train.loop import make_train_step
    model = CelebaMVAE(100)
    params, state = model.init(jax.random.key(0))
    tx = optax.adam(1e-4)
    one = make_train_step(model, tx, [[1., 1.], [1., 0.], [0., 1.]],
                          [[10., 1.]] * 3, device_data=True)
    host = np.random.default_rng(0)
    data = {"image": jnp.asarray(
                (host.random((2000, 64, 64, 3)) * 255).astype(np.uint8)),
            "attrs": jnp.asarray(
                (host.random((2000, N_ATTRS)) < 0.3).astype(np.float32))}
    c = one.lower(params, state, tx.init(params), jax.random.key(0),
                  (data, jnp.zeros((100,), jnp.int32)), 0.5).compile()
    ca = c.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    gflop = ca["flops"] / 1e9
    gb = ca["bytes accessed"] / 1e9
    t = ms_per_step / 1e3
    print(f"FLOPs/step: {gflop:.1f} G -> {gflop / 1e3 / t:.1f} TFLOPs "
          f"sustained = {100 * gflop / 1e3 / t / V5E_BF16_TFLOPS:.0f}% of "
          f"v5e bf16 peak")
    print(f"HLO 'bytes accessed'/step: {gb:.2f} GB (upper bound; "
          f"double-counts fusion-internal operands) -> would need "
          f"{gb / V5E_HBM_GBPS * 1e3:.2f} ms at {V5E_HBM_GBPS:.0f} GB/s; "
          f"measured {ms_per_step:.2f} ms proves true HBM traffic "
          f"< {V5E_HBM_GBPS * t:.2f} GB/step")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/mvae_trace")
    ap.add_argument("--capture", action="store_true")
    ns = ap.parse_args()
    if ns.capture:
        capture(ns.trace_dir)
    ms = analyze_trace(ns.trace_dir)
    cost_roofline(ms)


if __name__ == "__main__":
    main()
