"""CelebA conditional generation — condition on an ATTRIBUTE NAME
(/root/reference/celeba/sample.py:63-139). The reference's parser defines
--condition-on-text while the code and README use --condition-on-attrs
(SURVEY §2.6); we accept BOTH spellings."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax                                                       # noqa: E402
import jax.numpy as jnp                                          # noqa: E402

from mvae_tpu.data.celeba import (                               # noqa: E402
    load_celeba, ATTR_TO_IX_DICT, ATTR_IX_TO_KEEP, IX_TO_ATTR_DICT, N_ATTRS)
from mvae_tpu.models.celeba import CelebaMVAE                    # noqa: E402
from mvae_tpu.train.driver import load_model_checkpoint          # noqa: E402
from mvae_tpu.utils.cli import sample_parser                     # noqa: E402
from mvae_tpu.utils.png import save_image_grid                   # noqa: E402


def _attr_index(attr_name):
    if attr_name not in ATTR_TO_IX_DICT:
        raise SystemExit(f"unknown attribute {attr_name!r}; "
                         f"choose from {sorted(ATTR_TO_IX_DICT)}")
    ix = ATTR_TO_IX_DICT[attr_name]
    if ix not in ATTR_IX_TO_KEEP:
        raise SystemExit(f"{attr_name!r} is not one of the 18 kept attributes")
    return ATTR_IX_TO_KEEP.index(ix)


def attributes_to_names(vec):
    """Round a sigmoid attribute vector to names (reference
    tensor_to_attributes, celeba/datasets.py:138-152)."""
    return [IX_TO_ATTR_DICT[ATTR_IX_TO_KEEP[i]]
            for i, v in enumerate(np.asarray(vec)) if v > 0.5]


def main(argv=None):
    p = sample_parser(condition_on_image=dict(type=str, default=None),
                      condition_on_attrs=dict(type=str, default=None),
                      condition_on_text=dict(type=str, default=None,
                                             help='alias of --condition-on-attrs'))
    args = p.parse_args(argv)
    if args.condition_on_attrs is None:
        args.condition_on_attrs = args.condition_on_text
    model, params, state, _ = load_model_checkpoint(args.model_path,
                                                    CelebaMVAE)
    cond = {}
    if args.condition_on_image is not None:
        ds = load_celeba(args.data_dir, 'test')
        ai = _attr_index(args.condition_on_image)
        pool = ds.arrays["image"][ds.arrays["attrs"][:, ai] == 1]
        rng = np.random.default_rng(args.seed)
        cond["image"] = jnp.asarray(pool[rng.integers(len(pool))][None])
    if args.condition_on_attrs is not None:
        vec = np.zeros((1, N_ATTRS), np.float32)
        vec[0, _attr_index(args.condition_on_attrs)] = 1.0
        cond["attrs"] = jnp.asarray(vec)

    if cond:
        mu, logvar = model.infer(params, state, cond)
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
