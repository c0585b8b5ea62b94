"""Loss primitives with the reference's exact numerics.

All decoders emit logits; activations live in the loss (noted at
/root/reference/mnist/model.py:105,146).
"""

import jax
import jax.numpy as jnp


def binary_cross_entropy_with_logits(logits, targets):
    """Numerically stable sigmoid+BCE, elementwise.

    Same closed form as the reference's hand-rolled version
    (mnist/train.py:62-74): max(x,0) - x*t + log1p(exp(-|x|)).
    """
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def cross_entropy_with_logits(logits, labels, eps: float = 1e-6):
    """k-class CE: -log_softmax(logits + eps)[label], per sample.

    The reference (mnist/train.py:77-94) adds eps to the logits before
    log_softmax and one-hot-reduces; then the caller sums the (N, K) one-hot
    product over classes — net effect is the per-sample NLL. We return the
    per-sample NLL directly.

    logits: (..., K); labels: (...) int.
    """
    logp = jax.nn.log_softmax(logits + eps, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def bf16_loss_enabled() -> bool:
    """MVAE_BF16_LOSS=1: compute the BCE ELEMENTWISE math (exp/log1p and
    the backward's sigmoid) in bfloat16 when the logits already are bf16,
    accumulating the row sums in f32. Read at trace time (same caveat as
    MVAE_GROUPED_TERM_LOSS: flipping the env var after a step is compiled
    has no effect). Unlike MVAE_BF16_LOGITS this CHANGES loss math — the
    per-element BCE rounds to bf16 before the f32 row accumulation — so a
    default flip is gated on a convergence-parity row exactly like
    bf16_logits/decode_bf16 were (BASELINE.md round-5 section records the
    A/B either way). Motivation: the vision step is 59.7% VPU work
    dominated by these transcendentals, priced at f32 VPU rate
    (BASELINE.md vision re-trace)."""
    import os
    return os.environ.get("MVAE_BF16_LOSS") == "1"


def bce_row_sum(logits, targets):
    """sum(BCE-with-logits, axis=-1) over trailing dim of a 2-D batch.

    The Pallas kernel (ops/elbo_pallas.py) is opt-in via MVAE_PALLAS=1:
    measured on v5e, XLA's fused elementwise+reduce beats it at our shapes
    (375us vs 762us at 700x12288) — per the TPU guide, don't hand-schedule
    what the compiler already fuses. Kept for larger-row future workloads
    and as the kernel-authoring reference."""
    import os
    import jax
    if (os.environ.get("MVAE_PALLAS") == "1"
            and len(jax.devices()) == 1 and logits.ndim == 2
            and logits.dtype == jnp.float32):    # kernel is f32-only
        from mvae_tpu import ops
        return ops.bce_sum(logits, targets)
    if bf16_loss_enabled() and logits.dtype == jnp.bfloat16:
        # opt-in bf16 elementwise loss math (see bf16_loss_enabled); the
        # wide row sums still accumulate in f32
        return jnp.sum(binary_cross_entropy_with_logits(
            logits, targets.astype(jnp.bfloat16)),
            axis=-1, dtype=jnp.float32)
    # f32 math regardless of logits dtype: with MVAE_BF16_LOGITS=1 the
    # decoders emit bf16 logits (half the HBM bytes for the largest
    # activation) and the cast fuses into this read — but the 12288-wide
    # row sums must still accumulate in f32
    return jnp.sum(binary_cross_entropy_with_logits(
        logits.astype(jnp.float32), targets.astype(jnp.float32)), axis=-1)


def kl_divergence(mu, logvar):
    """Analytic KL(q || N(0, I)) summed over latent dims, per sample.

    -0.5 * sum(1 + logvar - mu^2 - exp(logvar))   (mnist/train.py:56)
    """
    return -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar),
                          axis=-1)
