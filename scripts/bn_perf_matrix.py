"""A/B/C the BatchNorm implementations on the production step (real TPU).

Modes, per family and dtype:
  two_pass — var = mean(square(x - mean)): the round-2 baseline (one extra
             full read of every BN input per step)
  one_pass — var = E[x^2] - E[x]^2 fused into a single read (nn/norm.py
             default since round 3)
  pallas   — fused BN+swish kernels, fwd + custom VJP (ops/bn_pallas.py)
  mxu      — one-pass moments as ones-vector matmuls on the MXU instead
             of VPU channel reductions (forward only; nn/norm.py)

Usage:  python scripts/bn_perf_matrix.py [--families celeba,...] [--k 100]
        [--modes two_pass,one_pass,pallas,mxu] [--f32] [--bf16]
Rows feed BASELINE.md's BN-fusion section by hand.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp                                        # noqa: E402

from scripts.bench_families import bench_family                # noqa: E402


def set_mode(mode: str) -> None:
    """two_pass | one_pass | pallas | mxu | bf16_logits (one-pass BN +
    bf16 train-mode logits, meaningful with a bf16 dtype only). All the
    switches are the public env vars, read at trace time."""
    os.environ["MVAE_BN_TWO_PASS"] = "1" if mode == "two_pass" else "0"
    os.environ["MVAE_PALLAS_BN"] = "1" if mode == "pallas" else "0"
    os.environ["MVAE_BN_MXU_MOMENTS"] = "1" if mode == "mxu" else "0"
    os.environ["MVAE_BF16_LOGITS"] = "1" if mode == "bf16_logits" else "0"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="celeba")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--modes", default="two_pass,one_pass,pallas,mxu")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ns = ap.parse_args()
    dtypes = []
    if ns.f32 or not ns.bf16:
        dtypes.append(None)
    if ns.bf16 or not ns.f32:
        dtypes.append(jnp.bfloat16)
    import time
    for fam in ns.families.split(","):
        for dtype in dtypes:
            for mode in ns.modes.split(","):
                set_mode(mode)
                print(f"[{mode:8s}] ", end="", flush=True)
                for attempt in range(3):   # tunnel drops are transient
                    try:
                        bench_family(fam, ns.k, dtype=dtype)
                        break
                    except Exception as e:
                        print(f"  retry ({type(e).__name__})", flush=True)
                        if attempt == 2:
                            # deterministic failure in ONE mode (e.g. a
                            # lowering error) — report it and keep the
                            # rest of the matrix alive
                            print(f"  FAILED {mode}: {e}", flush=True)
                        else:
                            time.sleep(20)


if __name__ == "__main__":
    main()
