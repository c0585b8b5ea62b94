"""FashionMNIST conditional generation (4 modes), mirroring
/root/reference/fashionmnist/sample.py:50-124 with the label-0 truthiness
and `infer(1, ...)` bogus-positional bugs fixed (SURVEY §2.6)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax                                                       # noqa: E402
import jax.numpy as jnp                                          # noqa: E402

from mvae_tpu.data.mnist import load_mnist                       # noqa: E402
from mvae_tpu.models.fashionmnist import FashionMnistMVAE        # noqa: E402
from mvae_tpu.train.driver import load_model_checkpoint          # noqa: E402
from mvae_tpu.utils.cli import sample_parser                     # noqa: E402
from mvae_tpu.utils.png import save_image_grid                   # noqa: E402


def main(argv=None):
    p = sample_parser(condition_on_image=dict(type=int, default=None),
                      condition_on_text=dict(type=int, default=None))
    args = p.parse_args(argv)
    model, params, state, _ = load_model_checkpoint(args.model_path,
                                                    FashionMnistMVAE)
    cond = {}
    if args.condition_on_image is not None:
        ds = load_mnist(args.data_dir, train=False, variant="FashionMNIST",
                        flatten=False)
        pool = ds.arrays["image"][ds.arrays["text"] == args.condition_on_image]
        rng = np.random.default_rng(args.seed)
        cond["image"] = jnp.asarray(pool[rng.integers(len(pool))][None])
    if args.condition_on_text is not None:
        cond["text"] = jnp.asarray([args.condition_on_text], jnp.int32)

    if cond:
        mu, logvar = model.infer(params, state, cond)
        mu, std = mu[0], jnp.exp(0.5 * logvar[0])
    else:
        mu = jnp.zeros((model.n_latents,))
        std = jnp.ones((model.n_latents,))
    eps = jax.random.normal(jax.random.key(args.seed),
                            (args.n_samples, model.n_latents))
    recons, _ = model.decode(params, state, mu + eps * std, None, False)
    images = jax.nn.sigmoid(recons["image"]).reshape(-1, 28, 28, 1)
    texts = jnp.argmax(recons["text"], axis=-1)

    os.makedirs(args.out_dir, exist_ok=True)
    save_image_grid(os.path.join(args.out_dir, 'sample_image.png'),
                    np.asarray(images))
    with open(os.path.join(args.out_dir, 'sample_text.txt'), 'w') as fp:
        for i, item in enumerate(np.asarray(texts).tolist()):
            fp.write('Text (%d): %s\n' % (i, item))


if __name__ == "__main__":
    main()
