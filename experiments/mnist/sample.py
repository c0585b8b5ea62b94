"""MNIST conditional generation — the reference's 4 modes
(/root/reference/mnist/sample.py:48-122): unconditional / condition on image
/ condition on text / both.

Reference quirks fixed (SURVEY.md §2.6): `--condition-on-image 0` and
`--condition-on-text 0` are honored (the reference's truthiness test treated
label 0 as "not provided", mnist/sample.py:72-79), and the conditioning image
is [0,1]-normalized like training data (the reference fed raw 0..255 floats).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax                                                       # noqa: E402
import jax.numpy as jnp                                          # noqa: E402

from mvae_tpu.data.mnist import load_mnist                       # noqa: E402
from mvae_tpu.models.mnist import MnistMVAE                      # noqa: E402
from mvae_tpu.train.driver import load_model_checkpoint          # noqa: E402
from mvae_tpu.utils.png import save_image_grid                   # noqa: E402


def fetch_mnist_image(label, data_dir, seed):
    ds = load_mnist(data_dir, train=False)
    images, labels = ds.arrays["image"], ds.arrays["text"]
    pool = images[labels == label]
    rng = np.random.default_rng(seed)
    return pool[rng.integers(len(pool))][None]            # (1, 784)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('model_path', type=str)
    p.add_argument('--n-samples', type=int, default=64)
    p.add_argument('--condition-on-image', type=int, default=None)
    p.add_argument('--condition-on-text', type=int, default=None)
    p.add_argument('--cuda', action='store_true', default=False)
    p.add_argument('--data-dir', type=str, default='./data')
    p.add_argument('--out-dir', type=str, default='.')
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args(argv)

    model, params, state, _ = load_model_checkpoint(args.model_path, MnistMVAE)
    cond = {}
    if args.condition_on_image is not None:
        cond["image"] = jnp.asarray(
            fetch_mnist_image(args.condition_on_image, args.data_dir, args.seed))
    if args.condition_on_text is not None:
        cond["text"] = jnp.asarray([args.condition_on_text], jnp.int32)

    if cond:
        mu, logvar = model.infer(params, state, cond)
        mu, std = mu[0], jnp.exp(0.5 * logvar[0])
    else:
        mu = jnp.zeros((model.n_latents,))
        std = jnp.ones((model.n_latents,))

    key = jax.random.key(args.seed)
    eps = jax.random.normal(key, (args.n_samples, model.n_latents))
    z = mu + eps * std
    recons, _ = model.decode(params, state, z, None, False)
    images = jax.nn.sigmoid(recons["image"]).reshape(-1, 28, 28, 1)
    texts = jnp.argmax(jax.nn.log_softmax(recons["text"], axis=-1), axis=-1)

    os.makedirs(args.out_dir, exist_ok=True)
    save_image_grid(os.path.join(args.out_dir, 'sample_image.png'),
                    np.asarray(images))
    with open(os.path.join(args.out_dir, 'sample_text.txt'), 'w') as fp:
        for i, item in enumerate(np.asarray(texts).tolist()):
            fp.write('Text (%d): %s\n' % (i, item))


if __name__ == "__main__":
    main()
