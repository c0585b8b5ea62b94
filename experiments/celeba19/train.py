"""CelebA-19 MVAE training CLI — flag surface per
/root/reference/celeba19/train.py:183-204 including --approx-m. The
reference's 20+m sequential eager forwards per step (:260-304) are ONE
jitted multi-term step here: the per-step sampled subset masks enter as a
runtime array. (Also fixes the reference's undefined args.out_dir at :355.)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np                                               # noqa: E402

from mvae_tpu.core.subsets import (                              # noqa: E402
    celeba19_step_terms, celeba19_static_terms, celeba19_recon_support)
from mvae_tpu.data.celeba import load_celeba                     # noqa: E402
from mvae_tpu.models.celeba19 import Celeba19MVAE, N_ATTRS       # noqa: E402
from mvae_tpu.train.driver import run_training                   # noqa: E402
from mvae_tpu.utils.cli import train_parser                      # noqa: E402


def apply_bf16_loss_default(bf16: bool, fast_term_decode: bool = False) -> None:
    """bf16 BCE elementwise loss math is the celeba19 DEFAULT under bf16
    compute: +8.9% steps/sec (BASELINE.md round-5 A/B — the 21-term
    grouped BCE is the repo's densest transcendental block) with the gate
    row celeba19@bf16@dec@bf16loss at 0.11-0.23% vs the torch baseline,
    indistinguishable from the control row. Neutral on every other
    family, so only this CLI flips it. MVAE_BF16_LOSS=0 pins the f32
    elementwise math; --f32 is unaffected (f32 logits never take the
    bf16 branch — core/losses.py:bce_row_sum).

    NOT applied under --fast-term-decode: fast mode already deletes the
    transcendental volume the bf16 math speeds up (measured neutral,
    319.8/s either way — BASELINE.md), so flipping it there would change
    numerics vs the gated celeba19@fast row for zero win. Explicit
    MVAE_BF16_LOSS=1 still composes if a user wants it."""
    if bf16 and not fast_term_decode:
        os.environ.setdefault("MVAE_BF16_LOSS", "1")


def main(argv=None):
    p = train_parser(
        n_latents=100, epochs=100, annealing_epochs=20, lr=1e-4,
        lambda_flags=(("lambda-image", 1.0), ("lambda-attrs", 10.0)),
        # +16% steps/sec; convergence parity identical to f32's gaps
        # (PARITY_convergence.json celeba19@bf16); --f32 for exact numerics
        bf16_default=True)
    p.add_argument('--approx-m', type=int, default=1,
                   help='number of sampled ELBO subset terms [default: 1]')
    p.add_argument('--fast-term-decode', action='store_true', default=False,
                   help='skip the image decode for attribute-only terms '
                        '(~+35%% steps/sec; image-decoder BatchNorm running '
                        'stats then see only image-bearing terms — a '
                        'documented divergence from the reference, which '
                        'decodes every modality every term)')
    args = p.parse_args(argv)

    apply_bf16_loss_default(args.bf16, args.fast_term_decode)

    train_ds = load_celeba(args.data_dir, 'train',
                           download=args.download,
                           exact_decode=args.exact_decode)
    test_ds = load_celeba(args.data_dir, 'val',
                          exact_decode=args.exact_decode)
    import jax.numpy as jnp
    model = Celeba19MVAE(args.n_latents,
                         compute_dtype=jnp.bfloat16 if args.bf16 else None)

    static_m, static_l = celeba19_static_terms(
        N_ATTRS, args.lambda_image, args.lambda_attrs)

    def make_masks(np_rng):
        return celeba19_step_terms(np_rng, args.approx_m, N_ATTRS,
                                   args.lambda_image, args.lambda_attrs)

    # eval: joint term only, default lambdas (celeba19/train.py:332-334)
    eval_masks = np.ones((1, 1 + N_ATTRS), np.float32)
    eval_lambdas = np.ones((1, 1 + N_ATTRS), np.float32)

    run_training(model, train_ds, test_ds, args, static_m, static_l,
                 out_dir=args.out_dir, eval_progress=True,
                 meta={"model": "celeba19", "n_latents": args.n_latents},
                 make_masks=make_masks,
                 eval_term_masks=eval_masks, eval_term_lambdas=eval_lambdas,
                 recon_support=celeba19_recon_support(args.approx_m, N_ATTRS),
                 fast_skip_decode=args.fast_term_decode)


if __name__ == "__main__":
    main()
