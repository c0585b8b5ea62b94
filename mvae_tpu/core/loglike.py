"""Importance-sampled marginal log-likelihood (the reference's missing
`loglike.py`).

README.md:36 of the reference promises a script estimating log p(x) by
importance sampling with q(z|x,y) as the proposal; no such file exists in the
reference tree (SURVEY.md §2.4). Implemented here from the paper's recipe
(IWAE bound, Burda et al. 2016):

    log p(x) >= logsumexp_k [ log p(x|z_k) + log p(z_k) - log q(z_k|·) ] - log K

The bound is monotone non-decreasing in K (tested), and equals the exact
marginal as K -> inf.
"""

import jax
import jax.numpy as jnp

from mvae_tpu.core.poe import masked_product_of_experts


def _log_normal(z, mu, logvar):
    """log N(z; mu, diag(exp(logvar))), summed over the last axis."""
    return -0.5 * jnp.sum(
        logvar + jnp.log(2.0 * jnp.pi)
        + jnp.square(z - mu) * jnp.exp(-logvar), axis=-1)


def iwae_log_marginal(model, params, state, inputs, proposal_mask,
                      target_names, rng, k: int):
    """Estimate log p(targets) for a batch.

    inputs:        dict with ALL modalities (placeholders allowed for ones
                   excluded from the proposal).
    proposal_mask: (M,) 0/1 — which modalities condition q (README says
                   q(z|x,y): all of them).
    target_names:  modalities whose reconstruction terms enter log p(x|z).
    k:             importance samples per example.

    Returns (B,) log-likelihood estimates.
    """
    mu_all, logvar_all, _ = model.encode(params, state, inputs, None, False)
    mask = jnp.asarray(proposal_mask, jnp.float32)
    q_mu, q_logvar = masked_product_of_experts(mu_all, logvar_all, mask)

    def one_sample(key):
        eps = jax.random.normal(key, q_mu.shape, q_mu.dtype)
        z = q_mu + eps * jnp.exp(0.5 * q_logvar)
        recons, _ = model.decode(params, state, z, None, False)
        log_px_z = 0.0
        for name in target_names:
            # recon_loss returns the per-sample NEGATIVE log-likelihood
            log_px_z = log_px_z - model.recon_loss(
                name, recons[name], inputs[name])
        log_pz = _log_normal(z, jnp.zeros_like(z), jnp.zeros_like(z))
        log_qz = _log_normal(z, q_mu, q_logvar)
        return log_px_z + log_pz - log_qz                      # (B,)

    keys = jax.random.split(rng, k)
    log_ws = jax.lax.map(one_sample, keys)                     # (K, B)
    return jax.scipy.special.logsumexp(log_ws, axis=0) - jnp.log(float(k))
