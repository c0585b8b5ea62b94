"""Reparameterization and posterior sampling helpers."""

import jax
import jax.numpy as jnp


def reparametrize(key, mu, logvar, *, train: bool):
    """z = mu + eps * exp(0.5*logvar) in training; mu in eval.

    Mirrors /root/reference/mnist/model.py:29-35 (eval mode returns the
    mean). `train` must be a static Python bool under jit.
    """
    if not train:
        return mu
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + eps * std


def sample_gaussian(key, mu, std, n_samples: int):
    """Draw n_samples z ~ N(mu, std^2) for generation (sample.py semantics:
    mnist/sample.py:103-109)."""
    eps = jax.random.normal(key, (n_samples,) + mu.shape[-1:], mu.dtype)
    return mu + eps * std
