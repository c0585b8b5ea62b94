"""Convert a reference PyTorch checkpoint (.pth.tar) to our msgpack format.

    python scripts/import_torch_checkpoint.py --family celeba \
        trained_models/model_best.pth.tar --out-dir trained_models/imported

The output (model_best.msgpack + checkpoint.msgpack) drives this repo's
sample.py / loglike.py unchanged; `--check` additionally runs a tiny
forward pass through the imported weights (CPU) as a sanity gate.

Reference save format: mnist/train.py:115-121,263-268 (same in every
experiment); key-name mapping in mvae_tpu/utils/torch_import.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvae_tpu.utils.torch_import import FAMILIES, import_checkpoint


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="reference .pth.tar path")
    ap.add_argument("--family", required=True, choices=sorted(FAMILIES))
    ap.add_argument("--out-dir", default="./trained_models/imported")
    ap.add_argument("--n-latents", type=int, default=None,
                    help="override if the checkpoint lacks n_latents")
    ap.add_argument("--check", action="store_true",
                    help="run a tiny forward pass on the imported weights")
    ns = ap.parse_args(argv)

    out_path, meta = import_checkpoint(ns.family, ns.checkpoint, ns.out_dir,
                                       n_latents=ns.n_latents)
    print(f"imported {ns.checkpoint} -> {out_path}")
    print(f"meta: {meta}")

    if ns.check:
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        import numpy as np
        from mvae_tpu.train.driver import load_model_checkpoint
        from mvae_tpu.models import model_ctor
        model, params, state, _ = load_model_checkpoint(
            out_path, model_ctor(ns.family))
        spec = model.input_spec()
        rng = np.random.default_rng(0)
        inputs = {}
        for name, (shape, dtype) in spec.items():
            if dtype == jnp.int32:
                inputs[name] = jnp.zeros((2,) + shape, jnp.int32)
            else:
                inputs[name] = jnp.asarray(
                    rng.random((2,) + shape), jnp.float32)
        mu, logvar, _ = model.encode(params, state, inputs, None, False)
        recons, _ = model.decode(params, state, mu[0], None, False)
        assert all(bool(jnp.isfinite(v).all()) for v in recons.values())
        print(f"check ok: encode -> mu {mu.shape}, decode -> "
              f"{ {k: tuple(v.shape) for k, v in recons.items()} }")


if __name__ == "__main__":
    main()
