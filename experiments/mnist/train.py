"""MNIST MVAE training CLI — flag surface mirrors the reference
(/root/reference/mnist/train.py:132-154) plus resume/seed/data-dir.

    python experiments/mnist/train.py --epochs 500 --lambda-text 50
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from mvae_tpu.data.mnist import load_mnist                      # noqa: E402
from mvae_tpu.models.mnist import MnistMVAE                     # noqa: E402
from mvae_tpu.train.driver import run_training                  # noqa: E402

# subset terms: joint, image-only, text-only (mnist/train.py:200-202)
TERM_MASKS = [[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--n-latents', type=int, default=64,
                   help='size of the latent embedding [default: 64]')
    p.add_argument('--batch-size', type=int, default=100, metavar='N')
    p.add_argument('--epochs', type=int, default=500, metavar='N')
    p.add_argument('--annealing-epochs', type=int, default=200, metavar='N')
    p.add_argument('--lr', type=float, default=1e-3, metavar='LR')
    p.add_argument('--log-interval', type=int, default=10, metavar='N')
    p.add_argument('--lambda-image', type=float, default=1.)
    p.add_argument('--lambda-text', type=float, default=10.)
    p.add_argument('--cuda', action='store_true', default=False,
                   help='kept for CLI parity; devices are auto-selected')
    p.add_argument('--data-dir', type=str, default='./data')
    p.add_argument('--out-dir', type=str, default='./trained_models')
    p.add_argument('--resume', type=str, default=None)
    p.add_argument('--seed', type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    train_ds = load_mnist(args.data_dir, train=True)
    test_ds = load_mnist(args.data_dir, train=False)
    model = MnistMVAE(args.n_latents)
    lambdas = [[args.lambda_image, args.lambda_text]] * 3
    run_training(model, train_ds, test_ds, args, TERM_MASKS, lambdas,
                 out_dir=args.out_dir,
                 meta={"model": "mnist", "n_latents": args.n_latents})


if __name__ == "__main__":
    main()
