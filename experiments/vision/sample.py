"""Vision conditional generation — condition on an arbitrary user image
file per --condition-type (vision/sample.py:24-136), re-applying the same
preprocessing as training (mask inversion, on-the-fly obscure/watermark,
vision/sample.py:51-103). Fixes the reference's get_params positional-arg
and undefined rotated_recon bugs (SURVEY §2.6)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax                                                       # noqa: E402
import jax.numpy as jnp                                          # noqa: E402

from mvae_tpu.image import transforms as T                       # noqa: E402
from mvae_tpu.models.vision import VisionMVAE, MODALITIES        # noqa: E402
from mvae_tpu.train.driver import load_model_checkpoint          # noqa: E402
from mvae_tpu.utils.cli import sample_parser                     # noqa: E402
from mvae_tpu.utils.png import save_image_grid                   # noqa: E402


def load_condition(path, ctype):
    """Load a user file and preprocess it into modality `ctype`'s space."""
    from PIL import Image
    from mvae_tpu.data.celeba import _resize_center_crop_64
    img = Image.open(path).convert('RGB')
    rgb = np.asarray(_resize_center_crop_64(img), np.float32)[None] / 255.0
    if ctype == "image":
        return rgb
    if ctype == "gray":
        return np.asarray(T.rgb_to_grayscale(jnp.asarray(rgb)))
    if ctype == "edge":
        # absolute = training-data semantics (data/vision.py canny_mode)
        return np.asarray(T.canny_edges(jnp.asarray(rgb),
                                        threshold_mode="absolute"))
    if ctype == "mask":
        g = np.asarray(T.rgb_to_grayscale(jnp.asarray(rgb)))
        return 1.0 - g                    # invert like training (:87)
    if ctype == "obscured":
        return np.asarray(T.obscure(jnp.asarray(rgb)))
    if ctype == "watermark":
        wm = jnp.asarray(T.load_watermark(64, 64, data_dir='./data'))
        return np.asarray(T.alpha_composite(jnp.asarray(rgb), wm))
    raise SystemExit(f"unknown condition type {ctype!r}")


def main(argv=None):
    p = sample_parser(
        condition_file=dict(type=str, default=None),
        condition_type=dict(type=str, default='image',
                            choices=list(MODALITIES)))
    for a in p._actions:                   # reference default: 1 sample
        if a.dest == "n_samples":
            a.default = 1
    args = p.parse_args(argv)
    model, params, state, _ = load_model_checkpoint(args.model_path,
                                                    VisionMVAE)
    if args.condition_file:
        cond = {args.condition_type: jnp.asarray(
            load_condition(args.condition_file, args.condition_type))}
        mu, logvar = model.infer(params, state, cond)
        mu, std = mu[0], jnp.exp(0.5 * logvar[0])
    else:
        mu = jnp.zeros((model.n_latents,))
        std = jnp.ones((model.n_latents,))

    eps = jax.random.normal(jax.random.key(args.seed),
                            (args.n_samples, model.n_latents))
    recons, _ = model.decode(params, state, mu + eps * std, None, False)

    out = os.path.join(args.out_dir, 'samples')
    os.makedirs(out, exist_ok=True)
    for m in MODALITIES:
        img = np.asarray(jax.nn.sigmoid(recons[m]))
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        save_image_grid(os.path.join(out, f'sample_{m}.png'), img,
                        nrow=min(8, args.n_samples))


if __name__ == "__main__":
    main()
