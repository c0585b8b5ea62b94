"""Generic importance-sampled log-likelihood CLI body (the reference's
promised-but-missing loglike.py, README.md:36). Each experiment's
loglike.py wires in its model constructor and test-set loader."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from mvae_tpu.core.loglike import iwae_log_marginal
from mvae_tpu.data.pipeline import batches
from mvae_tpu.train.driver import load_model_checkpoint


def run_loglike(argv, model_ctor, load_test_ds, *, default_target="image"):
    p = argparse.ArgumentParser()
    p.add_argument('model_path', type=str)
    p.add_argument('--n-samples', type=int, default=100,
                   help='importance samples K per example [default: 100]')
    p.add_argument('--batch-size', type=int, default=100)
    p.add_argument('--max-examples', type=int, default=None)
    p.add_argument('--target', type=str, default=default_target,
                   help='modality (or "joint") whose marginal to estimate')
    p.add_argument('--cuda', action='store_true', default=False)
    p.add_argument('--data-dir', type=str, default='./data')
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args(argv)

    model, params, state, _ = load_model_checkpoint(args.model_path,
                                                    model_ctor)
    test_ds = load_test_ds(args)
    all_targets = list(getattr(model, "loglike_targets", model.modalities))
    targets = all_targets if args.target == "joint" else [args.target]
    proposal = jnp.ones(len(model.modalities))

    estimate = jax.jit(lambda b, k: iwae_log_marginal(
        model, params, state, b, proposal, targets, k, args.n_samples))

    key = jax.random.key(args.seed)
    vals, seen = [], 0
    # no drop_remainder: every test example counts (reference test()
    # semantics, mnist/train.py:229-253); the ragged tail costs one extra
    # jit compile at its own batch shape
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
