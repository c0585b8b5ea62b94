"""Importance-sampled marginal log-likelihood for MNIST.

Implements the evaluator the reference README promises but never ships
(README.md:36; SURVEY.md §2.4): log p(x) estimated by importance sampling
with q(z|x,y) as proposal (IWAE bound).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax                                                       # noqa: E402
import jax.numpy as jnp                                          # noqa: E402
import numpy as np                                               # noqa: E402

from mvae_tpu.core.loglike import iwae_log_marginal              # noqa: E402
from mvae_tpu.data.mnist import load_mnist                       # noqa: E402
from mvae_tpu.data.pipeline import batches                       # noqa: E402
from mvae_tpu.models.mnist import MnistMVAE                      # noqa: E402
from mvae_tpu.train.driver import load_model_checkpoint          # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('model_path', type=str)
    p.add_argument('--n-samples', type=int, default=100,
                   help='importance samples K per example [default: 100]')
    p.add_argument('--batch-size', type=int, default=100)
    p.add_argument('--max-examples', type=int, default=None)
    p.add_argument('--target', type=str, default='image',
                   choices=['image', 'text', 'joint'],
                   help='estimate log p(image), log p(text) or log p(image,text)')
    p.add_argument('--cuda', action='store_true', default=False)
    p.add_argument('--data-dir', type=str, default='./data')
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args(argv)

    model, params, state, _ = load_model_checkpoint(args.model_path, MnistMVAE)
    test_ds = load_mnist(args.data_dir, train=False)
    targets = (["image", "text"] if args.target == "joint" else [args.target])
    proposal = jnp.ones(len(model.modalities))   # q(z|x,y) per README.md:36

    estimate = jax.jit(lambda b, k: iwae_log_marginal(
        model, params, state, b, proposal, targets, k, args.n_samples))

    key = jax.random.key(args.seed)
    vals, seen = [], 0
    for batch in batches(test_ds, args.batch_size, shuffle=False):
        if args.max_examples and seen >= args.max_examples:
            break
        key, sub = jax.random.split(key)
        vals.append(np.asarray(estimate(
            {k: jnp.asarray(v) for k, v in batch.items()}, sub)))
        seen += len(vals[-1])
    ll = float(np.mean(np.concatenate(vals)))
    print('====> log p({}) >= {:.4f}  (K={}, N={})'.format(
        args.target, ll, args.n_samples, seen))
    return ll


if __name__ == "__main__":
    main()
