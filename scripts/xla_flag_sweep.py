"""XLA compiler-flag sweep for the CelebA flagship step (v5e-1).

XLA_FLAGS is read once at backend init, so every configuration runs in a
fresh subprocess. Each run measures the production device-resident
K-step scan window (same protocol as bench.py, shorter windows so the
sweep stays ~1 min/config) with hard host fences.

Usage:  python scripts/xla_flag_sweep.py            # run the sweep
        python scripts/xla_flag_sweep.py --child    # (internal) one config

Findings land in BASELINE.md by hand; this script is the reproducer.

FINDING (2026-08-17, axon tunnel to v5e-1): TPU-specific XLA flags are
NOT injectable through the tunnel — the local client's XLA build parses
XLA_FLAGS and fatals on unknown TPU flags (`Unknown flag in XLA_FLAGS:
--xla_tpu_*`) before anything reaches the server-side TPU compiler.
Only `baseline` runs: 1.779 +- 0.003 ms/step (562 steps/sec, bf16),
matching the production headline. Re-run this sweep on a real TPU host
(where libtpu parses the flags) before concluding anything about the
flags themselves.
"""

import argparse
import json
import os
import subprocess
import sys

CONFIGS = {
    "baseline": "",
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "no_rwb": "--xla_tpu_rwb_fusion=false",
    "vmem64m+lhs": ("--xla_tpu_scoped_vmem_limit_kib=65536 "
                    "--xla_tpu_enable_latency_hiding_scheduler=true"),
}


def child(k, windows, bf16):
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mvae_tpu.models.celeba import CelebaMVAE, N_ATTRS
    from mvae_tpu.train.loop import make_multi_train_step

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    model = CelebaMVAE(100, compute_dtype=dtype)
    params, state = model.init(jax.random.key(0))
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    multi = make_multi_train_step(model, tx, [[1., 1.], [1., 0.], [0., 1.]],
                                  [[10.0, 1.0]] * 3)
    host = np.random.default_rng(0)
    n = 2000
    data = {
        "image": jax.device_put((host.random((1, n, 64, 64, 3)) * 255
                                 ).astype(np.uint8)),
        "attrs": jax.device_put((host.random((1, n, N_ATTRS)) < 0.3
                                 ).astype(np.float32)),
    }
    betas = jnp.full((k,), 0.5, jnp.float32)

    def window(args, seed):
        idxs = jnp.asarray(
            np.random.default_rng(seed).integers(0, n, (k, 1, 100)),
            jnp.int32)
        out = multi(*args, data, idxs, betas)
        return out[:4], out[4]

    args = (params, state, opt_state, jax.random.key(2))
    for w in range(2):
        args, losses = window(args, w)
    float(losses[-1])
    times = []
    for w in range(windows):
        t0 = time.perf_counter()
        args, losses = window(args, 10 + w)
        float(losses[-1])
        times.append((time.perf_counter() - t0) / k)
    ms = np.asarray(times) * 1e3
    print(json.dumps({"ms_per_step": float(ms.mean()),
                      "sd": float(ms.std()),
                      "steps_per_sec": float(1e3 / ms.mean())}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--k", type=int, default=240)
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--f32", dest="bf16", action="store_false")
    ap.add_argument("--configs", type=str, default=",".join(CONFIGS))
    ns = ap.parse_args()
    if ns.child:
        child(ns.k, ns.windows, ns.bf16)
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ns.configs.split(","):
        flags = CONFIGS[name]
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--k", str(ns.k), "--windows", str(ns.windows)]
            + ([] if ns.bf16 else ["--f32"]),
            env=env, cwd=repo, capture_output=True, text=True, timeout=600)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            res = json.loads(line)
            print(f"{name:12s}: {res['ms_per_step']:.3f} +- {res['sd']:.3f} "
                  f"ms/step ({res['steps_per_sec']:.1f} steps/sec)",
                  flush=True)
        except (json.JSONDecodeError, ValueError):
            tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
            print(f"{name:12s}: FAILED {' | '.join(tail)}", flush=True)


if __name__ == "__main__":
    main()
