"""CelebA MVAE training CLI — flag surface per
/root/reference/celeba/train.py:121-138 (defaults: L=100, bs=100, 100
epochs, anneal 20, lr 1e-4, lambda-attrs 10)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from mvae_tpu.data.celeba import load_celeba                     # noqa: E402
from mvae_tpu.models.celeba import CelebaMVAE                    # noqa: E402
from mvae_tpu.train.driver import run_training                   # noqa: E402
from mvae_tpu.utils.cli import train_parser                      # noqa: E402

TERM_MASKS = [[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]


def main(argv=None):
    args = train_parser(
        n_latents=100, epochs=100, annealing_epochs=20, lr=1e-4,
        lambda_flags=(("lambda-image", 1.0), ("lambda-attrs", 10.0)),
        # bf16 default: +6-9% steps/sec at the production window with
        # convergence parity at the f32 gap (PARITY_convergence.json
        # celeba@bf16: ELBO/IWAE within 0.05-0.08% of the torch baseline,
        # same as f32); bf16 compute also enables bf16 in-step input
        # decode (+5.4% more; celeba@bf16@dec gap 0.073%, tighter than
        # @bf16 — train/loop.py:resolve_decode_dtype); --f32 restores
        # exact reference numerics including f32 decode
        bf16_default=True,
    ).parse_args(argv)
    train_ds = load_celeba(args.data_dir, 'train',
                           exact_decode=args.exact_decode,
                           download=args.download)
    test_ds = load_celeba(args.data_dir, 'val',   # reference evals on val
                          exact_decode=args.exact_decode)
    import jax.numpy as jnp
    model = CelebaMVAE(args.n_latents,
                       compute_dtype=jnp.bfloat16 if args.bf16 else None)
    lambdas = [[args.lambda_image, args.lambda_attrs]] * 3
    run_training(model, train_ds, test_ds, args, TERM_MASKS, lambdas,
                 out_dir=args.out_dir, eval_progress=True,
                 meta={"model": "celeba", "n_latents": args.n_latents})


if __name__ == "__main__":
    main()
