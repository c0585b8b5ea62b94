"""Roofline + trace analysis for ANY family's production training step.

Generalizes scripts/roofline_celeba.py (which drives the celeba CLI's
--profile-dir path) to all six families by tracing the same K-step
device-resident window scripts/bench_families.py measures:

  1. build the family's production window (device-resident uint8 data,
     K-step lax.scan, the family's masks/lambdas/recon config exactly as
     its driver sets them), run it under jax.profiler.trace;
  2. parse the xplane with jax.profiler.ProfileData: module wall time,
     per-op durations, category aggregation;
  3. XLA cost analysis of the K=1 window (a scan body is counted once):
     FLOPs + the HLO-level "bytes accessed" upper bound vs v5e peaks.

Usage (on the real TPU):
    python scripts/roofline_family.py --family vision [--bf16] [--k 20]
        [--top 15]    # also dump the top-N single ops by time
"""

import argparse
import glob
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402
import numpy as np                                             # noqa: E402
import optax                                                   # noqa: E402

from bench_families import FAMILIES                            # noqa: E402
from mvae_tpu.train.loop import make_multi_train_step          # noqa: E402

V5E_BF16_TFLOPS = 197.0
V5E_F32_TFLOPS = 98.5   # v5e f32 matmul peak is ~half the bf16 rate
V5E_HBM_GBPS = 819.0


def build_window(family, k, dtype):
    rng = np.random.default_rng(0)
    model, data, masks, lambdas, opts = FAMILIES[family](rng, dtype)
    B = opts.get("batch", 100)
    tx = optax.adam(1e-4)
    params, state = model.init(jax.random.key(0))
    opt_state = tx.init(params)
    data = {kk: jax.device_put(v) for kk, v in data.items()}
    n = next(iter(data.values())).shape[1]
    idxs = jnp.asarray(rng.integers(0, n, (k, 1, B)), jnp.int32)
    betas = jnp.full((k,), 0.5, jnp.float32)
    if opts.get("dynamic", False):
        multi = make_multi_train_step(
            model, tx, None, None, dynamic_masks=True,
            recon_support=opts.get("recon_support"))
        extra = (jnp.broadcast_to(jnp.asarray(masks, jnp.float32),
                                  (k,) + np.shape(masks)),
                 jnp.broadcast_to(jnp.asarray(lambdas, jnp.float32),
                                  (k,) + np.shape(lambdas)))
    else:
        multi = make_multi_train_step(
            model, tx, masks, lambdas,
            recon_masks=opts.get("recon_masks"))
        extra = ()

    def window(args):
        out = multi(*args, data, idxs, betas, *extra)
        return out[:4], out[4]

    def lower_one():
        extra1 = tuple(e[:1] for e in extra)
        return multi.lower(params, state, opt_state, jax.random.key(6),
                           data, idxs[:1], betas[:1], *extra1)

    return window, (params, state, opt_state, jax.random.key(6)), lower_one


def categorize(name):
    if name.startswith("%copy") or ".copy" in name:
        return "copies (prefetch waits / loop-carry / layout)"
    if "convolution" in name:
        return "convolution (unfused)"
    # weight-grad outputs are kernel-shaped (4,4,Cin,Cout / 5,5,... /
    # up to 16,16 fused variants); activation tensors lead with the batch
    # (50/100 in every bench window), so bound the dims instead of only
    # matching single digits (ADVICE r3: \[[2-9],[2-9], missed [16,16,...])
    m = re.search(r"= \(?(?:f32|bf16)\[(\d+),(\d+),", name)
    if ("multiply_add_fusion" in name and m
            and 2 <= int(m.group(1)) <= 16 and 2 <= int(m.group(2)) <= 16):
        return "conv weight-grad fusions (MXU)"
    if "multiply_reduce_fusion" in name:
        return "BN moment/grad reductions"
    if re.search(r"= \(?(f32|bf16)\[\d+,\d+,\d+,\d+", name) \
            and "fusion" in name:
        return "conv/deconv activation fusions (MXU)"
    if "dot" in name:
        return "FC matmul fusions (MXU)"
    if "dynamic" in name or "gather" in name:
        return "gather/dynamic-slice"
    if "reduce" in name:
        return "other reductions"
    return "BN/EMA vector fusions + ELBO row-sums + misc elementwise"


def analyze_trace(trace_dir, n_steps, top=0):
    from jax.profiler import ProfileData
    pbs = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not pbs:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    p = ProfileData.from_file(pbs[-1])
    tpu_planes = [pl for pl in p.planes if "TPU" in pl.name]
    if not tpu_planes:
        raise SystemExit(
            "no TPU plane in trace — run on the TPU host (this script "
            "analyzes device op events, not CPU traces)")
    plane = tpu_planes[0]
    lines = {ln.name: list(ln.events) for ln in plane.lines}
    if "XLA Modules" not in lines or "XLA Ops" not in lines:
        raise SystemExit(
            "trace has a TPU plane but no 'XLA Modules'/'XLA Ops' lines — "
            "the traced window executed nothing on the device")
    module_ms = sum(e.duration_ns for e in lines["XLA Modules"]) / 1e6
    print(f"module execution: {module_ms:.2f} ms "
          f"(K={n_steps} steps -> {module_ms / n_steps:.3f} ms/step)")
    evs = [e for e in lines["XLA Ops"] if not e.name.startswith("%while")]
    agg, cnt = defaultdict(float), defaultdict(int)
    per_op = defaultdict(float)
    for e in evs:
        c = categorize(e.name)
        agg[c] += e.duration_ns / 1e6
        cnt[c] += 1
        if top:
            per_op[e.name.split(" = ")[0]] += e.duration_ns / 1e6
    tot = sum(agg.values())
    print(f"{len(evs)} device op events ({len(evs) / n_steps:.0f} ops/step)")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {v / n_steps * 1e3:7.1f} us/step {100 * v / tot:5.1f}% "
              f"x{cnt[k] / n_steps:6.1f}/step  {k}")
    if top:
        print(f"top {top} single ops:")
        names = {e.name.split(' = ')[0]: e.name for e in evs}
        for nm, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {v / n_steps * 1e3:7.1f} us/step  "
                  f"[{categorize(names[nm])}] {names[nm][:140]}")
    return module_ms / n_steps


def cost_roofline(lower_one, ms_per_step, bf16=True):
    ca = lower_one().compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    gflop = ca["flops"] / 1e9
    gb = ca["bytes accessed"] / 1e9
    t = ms_per_step / 1e3
    peak = V5E_BF16_TFLOPS if bf16 else V5E_F32_TFLOPS
    label = "bf16" if bf16 else "f32"
    print(f"FLOPs/step: {gflop:.1f} G -> {gflop / 1e3 / t:.1f} TFLOPs "
          f"sustained = {100 * gflop / 1e3 / t / peak:.0f}% of "
          f"v5e {label} peak ({peak:.1f} TFLOPs)")
    print(f"HLO 'bytes accessed'/step: {gb:.2f} GB (upper bound; "
          f"double-counts fusion-internal operands) -> would need "
          f"{gb / V5E_HBM_GBPS * 1e3:.2f} ms at {V5E_HBM_GBPS:.0f} GB/s; "
          f"measured {ms_per_step:.3f} ms/step")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="vision", choices=sorted(FAMILIES))
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--trace-dir", default=None)
    ns = ap.parse_args()
    dtype = jnp.bfloat16 if ns.bf16 else None
    window, args, lower_one = build_window(ns.family, ns.k, dtype)
    args, losses = window(args)          # compile + warm
    float(losses[-1])
    trace_dir = ns.trace_dir or tempfile.mkdtemp(
        prefix=f"mvae_trace_{ns.family}_")
    with jax.profiler.trace(trace_dir):
        args, losses = window(args)
        float(losses[-1])
    print(f"trace: {trace_dir}")
    ms = analyze_trace(trace_dir, ns.k, top=ns.top)
    cost_roofline(lower_one, ms, bf16=ns.bf16)


if __name__ == "__main__":
    main()
