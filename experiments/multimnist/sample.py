"""MultiMNIST conditional generation — condition on a digit STRING
(/root/reference/multimnist/sample.py:65-139). Fixes from SURVEY §2.6: the
image-fetch list shadowing (:34-39) and txt_recon/text_recon mismatch
(:137-138)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax                                                       # noqa: E402
import jax.numpy as jnp                                          # noqa: E402

from mvae_tpu.data.multimnist import load_multimnist             # noqa: E402
from mvae_tpu.data.text import encode_string, decode_tokens      # noqa: E402
from mvae_tpu.models.multimnist import MultiMnistMVAE            # noqa: E402
from mvae_tpu.train.driver import load_model_checkpoint          # noqa: E402
from mvae_tpu.utils.cli import sample_parser                     # noqa: E402
from mvae_tpu.utils.png import save_image_grid                   # noqa: E402


def fetch_multimnist_image(text, data_dir, seed):
    """Random test image whose digit string matches `text`."""
    ds = load_multimnist(data_dir, train=False)
    want = encode_string(text)
    match = np.all(ds.arrays["text"] == want[None, :], axis=1)
    pool = ds.arrays["image"][match]
    if len(pool) == 0:
        raise SystemExit(f"no test image with digit string {text!r}")
    rng = np.random.default_rng(seed)
    return pool[rng.integers(len(pool))][None]


def main(argv=None):
    p = sample_parser(condition_on_image=dict(type=str, default=None),
                      condition_on_text=dict(type=str, default=None))
    args = p.parse_args(argv)
    model, params, state, _ = load_model_checkpoint(args.model_path,
                                                    MultiMnistMVAE)
    cond = {}
    if args.condition_on_image is not None:
        cond["image"] = jnp.asarray(fetch_multimnist_image(
            args.condition_on_image, args.data_dir, args.seed))
    if args.condition_on_text is not None:
        cond["text"] = jnp.asarray(
            encode_string(args.condition_on_text)[None], jnp.int32)

    if cond:
        mu, logvar = model.infer(params, state, cond)
        mu, std = mu[0], jnp.exp(0.5 * logvar[0])
    else:
        mu = jnp.zeros((model.n_latents,))
        std = jnp.ones((model.n_latents,))
    eps = jax.random.normal(jax.random.key(args.seed),
                            (args.n_samples, model.n_latents))
    recons, _ = model.decode(params, state, mu + eps * std, None, False)
    images = jax.nn.sigmoid(recons["image"]).reshape(-1, 50, 50, 1)
    tokens = jnp.argmax(recons["text"], axis=-1)      # (N, 4)

    os.makedirs(args.out_dir, exist_ok=True)
    save_image_grid(os.path.join(args.out_dir, 'sample_image.png'),
                    np.asarray(images))
    with open(os.path.join(args.out_dir, 'sample_text.txt'), 'w') as fp:
        for i, row in enumerate(np.asarray(tokens)):
            fp.write('Text (%d): %s\n' % (i, decode_tokens(row)))


if __name__ == "__main__":
    main()
