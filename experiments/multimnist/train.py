"""MultiMNIST MVAE training CLI — flag surface per
/root/reference/multimnist/train.py (defaults: L=64, bs=100, 500 epochs,
anneal 200, lr 1e-3, lambda-text 10)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from mvae_tpu.data.multimnist import load_multimnist             # noqa: E402
from mvae_tpu.models.multimnist import MultiMnistMVAE            # noqa: E402
from mvae_tpu.train.driver import run_training                   # noqa: E402
from mvae_tpu.utils.cli import train_parser                      # noqa: E402

TERM_MASKS = [[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]


def main(argv=None):
    args = train_parser(n_latents=64, epochs=500, annealing_epochs=200,
                        lr=1e-3,
                        # +14% steps/sec; parity row multimnist@bf16
                        # (0.45-0.56% vs torch, same order as f32's gaps
                        # and inside the seed spread); --f32 for exact
                        bf16_default=True).parse_args(argv)
    train_ds = load_multimnist(args.data_dir, train=True,
                               download=args.download)
    test_ds = load_multimnist(args.data_dir, train=False,
                              download=args.download)
    import jax.numpy as jnp
    model = MultiMnistMVAE(args.n_latents,
                           compute_dtype=jnp.bfloat16 if args.bf16 else None)
    lambdas = [[args.lambda_image, args.lambda_text]] * 3
    # eval uses DEFAULT lambdas (1.0), matching the reference test()
    # (multimnist/train.py:256-258 — no lambda kwargs)
    run_training(model, train_ds, test_ds, args, TERM_MASKS, lambdas,
                 out_dir=args.out_dir,
                 eval_term_lambdas=[[1.0, 1.0]] * 3,
                 meta={"model": "multimnist", "n_latents": args.n_latents})


if __name__ == "__main__":
    main()
