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
