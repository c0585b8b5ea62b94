"""Vision MVAE training CLI — 6 image modalities, 7 ELBO terms per step
(joint + 6 unimodal, vision/train.py:186-283). Flag surface per
vision/train.py:114-128 (L=250, bs=50, 100 epochs, anneal 20, lr 1e-4; all
lambdas 1, loss divides summed BCE by 6). Dumps a reconstruction grid per
epoch like the reference (:335-368)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np                                               # noqa: E402

from mvae_tpu.data.vision import load_celeb_vision, N_MODALITIES  # noqa: E402
from mvae_tpu.models.vision import VisionMVAE, MODALITIES        # noqa: E402
from mvae_tpu.train.driver import run_training                   # noqa: E402
from mvae_tpu.utils.cli import train_parser                      # noqa: E402
from mvae_tpu.utils.png import save_image_grid                   # noqa: E402

# joint + one unimodal term per modality. The posterior masks pick which
# expert(s) feed each term's PoE; EVERY term reconstructs ALL six modalities
# (vision/train.py:227-283 — each unimodal forward decodes and scores all
# six), hence the all-ones RECON_MASKS. Each modality's BCE is weighted
# 1/6 (vision/train.py:57).
TERM_MASKS = np.concatenate([np.ones((1, 6), np.float32),
                             np.eye(6, dtype=np.float32)])
RECON_MASKS = np.ones((7, 6), np.float32)
TERM_LAMBDAS = np.full((7, 6), 1.0 / N_MODALITIES, np.float32)
# eval computes the JOINT term only (vision/train.py:324-332)
EVAL_MASKS = np.ones((1, 6), np.float32)
EVAL_LAMBDAS = np.full((1, 6), 1.0 / N_MODALITIES, np.float32)


def _recon_dump(model, test_ds, out_dir):
    import jax
    import jax.numpy as jnp
    batch = {k: jnp.asarray(v[:8]) for k, v in test_ds.arrays.items()}

    def hook(epoch, params, state):
        mu, _ = model.infer(params, state, batch)
        recons, _ = model.decode(params, state, mu, None, False)
        rows = []
        for m in MODALITIES:
            img = np.asarray(jax.nn.sigmoid(recons[m]))
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            rows.append(img)
        grid = np.concatenate(rows)          # 6 rows of 8
        os.makedirs(os.path.join(out_dir, "reconstructions"), exist_ok=True)
        save_image_grid(os.path.join(out_dir, "reconstructions",
                                     f"epoch_{epoch}.png"), grid, nrow=8)
    return hook


def main(argv=None):
    args = train_parser(n_latents=250, epochs=100, annealing_epochs=20,
                        lr=1e-4, batch_size=50, lambda_flags=(),
                        # +24% steps/sec; convergence parity at the f32
                        # gap (PARITY_convergence.json vision@bf16)
                        bf16_default=True).parse_args(argv)
    train_ds = load_celeb_vision(args.data_dir, 'train',
                                 exact_decode=args.exact_decode,
                                 download=args.download)
    test_ds = load_celeb_vision(args.data_dir, 'val',
                                exact_decode=args.exact_decode)
    import jax.numpy as jnp
    model = VisionMVAE(args.n_latents,
                       compute_dtype=jnp.bfloat16 if args.bf16 else None)
    run_training(model, train_ds, test_ds, args, TERM_MASKS, TERM_LAMBDAS,
                 out_dir=args.out_dir,
                 meta={"model": "vision", "n_latents": args.n_latents},
                 recon_masks=RECON_MASKS,
                 eval_term_masks=EVAL_MASKS, eval_term_lambdas=EVAL_LAMBDAS,
                 post_epoch=_recon_dump(model, test_ds, args.out_dir))


if __name__ == "__main__":
    main()
