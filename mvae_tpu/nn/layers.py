"""Core stateless layers: linear, embedding, swish, dropout, MLP helper."""

import jax
import jax.numpy as jnp

from mvae_tpu.nn.initializers import linear_init


def linear(params, x):
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


def embedding(params, idx):
    """Index lookup. For tiny vocabularies inside larger fused graphs prefer
    one_hot @ table (an MXU matmul) — see models that stack expert tables."""
    return jnp.take(params["table"], idx, axis=0)


def swish(x):
    """x * sigmoid(x) — the only activation the reference uses
    (mnist/model.py:166-169)."""
    return x * jax.nn.sigmoid(x)


def dropout(key, x, rate: float, train: bool):
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def mlp_init(key, dims, *, dtype=jnp.float32):
    """dims = [d0, d1, ..., dn]; returns list of linear params."""
    keys = jax.random.split(key, len(dims) - 1)
    return [linear_init(k, a, b, dtype=dtype)
            for k, a, b in zip(keys, dims[:-1], dims[1:])]


def mlp_apply(params, x, *, final_activation=False):
    """Swish between layers; logits out unless final_activation."""
    n = len(params)
    for i, p in enumerate(params):
        x = linear(p, x)
        if i < n - 1 or final_activation:
            x = swish(x)
    return x
