"""Product-of-Experts posterior fusion — the conceptual core of the MVAE.

Reference semantics (/root/reference/mnist/model.py:149-163 and the identical
copies in the other five experiments): given per-expert Gaussians
(mu_i, logvar_i), the fused posterior is the precision-weighted product

    T_i   = 1 / var_i
    mu*   = sum_i(mu_i * T_i) / sum_i(T_i)
    var*  = 1 / sum_i(T_i)

with a universal N(0, I) prior expert always prepended
(mnist/model.py:172-185). Two of the six reference copies add eps twice
(SURVEY.md §2.6); we standardize on the single-eps convention of
multimnist/model.py:245-252.

TPU-native redesign: the reference builds a DYNAMIC expert list (skipping
absent modalities with Python `if image is not None`, mnist/model.py:46-64).
Under jit that would retrace per subset. Here presence is a static-shaped
0/1 mask multiplying each expert's precision, so a single compiled graph
evaluates ANY subset — and a whole batch of subset terms at once via vmap.
The prior expert (mu=0, logvar=0 => T=1/(1+eps)) is folded in analytically;
it never needs to be materialized or encoded.
"""

import jax.numpy as jnp


def product_of_experts(mu, logvar, eps: float = 1e-8):
    """Dense PoE over leading expert axis. mu, logvar: (M, ..., D).

    NOTE: does NOT include the prior expert; callers prepend it (or use
    masked_product_of_experts, which folds it in).
    """
    var = jnp.exp(logvar) + eps
    t = 1.0 / var
    sum_t = jnp.sum(t, axis=0)
    pd_mu = jnp.sum(mu * t, axis=0) / sum_t
    pd_var = 1.0 / sum_t
    return pd_mu, jnp.log(pd_var)


def masked_product_of_experts(mu, logvar, mask, eps: float = 1e-8):
    """Masked PoE with the universal prior expert folded in.

    mu, logvar: (M, B, D) stacked modality posteriors (NO prior row).
    mask:       (M,) or (M, B) floats in {0,1}; 0 removes an expert exactly
                (its precision contributes nothing).

    Equivalent to prepending the prior row and running the dense PoE on the
    present subset: prior contributes T0 = 1/(exp(0)+eps) and mu0 = 0.

    Returns (pd_mu, pd_logvar), each (B, D).
    """
    var = jnp.exp(logvar) + eps
    t = 1.0 / var
    m = mask.reshape(mask.shape + (1,) * (mu.ndim - mask.ndim))
    t = t * m
    prior_t = 1.0 / (1.0 + eps)
    sum_t = jnp.sum(t, axis=0) + prior_t
    pd_mu = jnp.sum(mu * t, axis=0) / sum_t   # prior adds 0 * prior_t
    pd_var = 1.0 / sum_t
    return pd_mu, jnp.log(pd_var)
