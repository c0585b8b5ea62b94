"""CelebA-19 conditional generation. The reference ships NO sample.py for
celeba19; this follows the celeba sampler's 4 modes (celeba/sample.py)
against the 19-expert model, with per-attribute conditioning: each named
attribute contributes ONLY its own expert (celeba19/model.py:63-89
semantics), via a 0/1 attrs_mask."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax                                                       # noqa: E402
import jax.numpy as jnp                                          # noqa: E402

from mvae_tpu.data.celeba import load_celeba                     # noqa: E402
from mvae_tpu.models.celeba19 import Celeba19MVAE, N_ATTRS       # noqa: E402
from mvae_tpu.train.driver import load_model_checkpoint          # noqa: E402
from mvae_tpu.utils.cli import sample_parser                     # noqa: E402
from mvae_tpu.utils.png import save_image_grid                   # noqa: E402
from experiments.celeba.sample import (                          # noqa: E402
    _attr_index, attributes_to_names)


def main(argv=None):
    p = sample_parser(condition_on_image=dict(type=str, default=None),
                      condition_on_attrs=dict(type=str, default=None))
    args = p.parse_args(argv)
    model, params, state, _ = load_model_checkpoint(args.model_path,
                                                    Celeba19MVAE)
    inputs, attrs_mask = {}, None
    if args.condition_on_image is not None:
        ds = load_celeba(args.data_dir, 'test')
        ai = _attr_index(args.condition_on_image)
        pool = ds.arrays["image"][ds.arrays["attrs"][:, ai] == 1]
        rng = np.random.default_rng(args.seed)
        inputs["image"] = jnp.asarray(pool[rng.integers(len(pool))][None])
    if args.condition_on_attrs is not None:
        vec = np.zeros((1, N_ATTRS), np.float32)
        mask = np.zeros(N_ATTRS, np.float32)
        ai = _attr_index(args.condition_on_attrs)
        vec[0, ai], mask[ai] = 1.0, 1.0
        inputs["attrs"], attrs_mask = jnp.asarray(vec), jnp.asarray(mask)

    if inputs:
        mu, logvar = model.infer(params, state, inputs,
                                 attrs_mask=attrs_mask)
        mu, std = mu[0], jnp.exp(0.5 * logvar[0])
    else:
        mu = jnp.zeros((model.n_latents,))
        std = jnp.ones((model.n_latents,))
    eps = jax.random.normal(jax.random.key(args.seed),
                            (args.n_samples, model.n_latents))
    recons, _ = model.decode(params, state, mu + eps * std, None, False)
    images = jax.nn.sigmoid(recons["image"])
    attrs = jax.nn.sigmoid(recons["attrs"])

    os.makedirs(args.out_dir, exist_ok=True)
    save_image_grid(os.path.join(args.out_dir, 'sample_image.png'),
                    np.asarray(images))
    with open(os.path.join(args.out_dir, 'sample_attrs.txt'), 'w') as fp:
        for row in np.asarray(attrs):
            fp.write('%s\n' % ','.join(attributes_to_names(row)))


if __name__ == "__main__":
    main()
