"""BatchNorm with explicit running-stats state (torch semantics).

torch BatchNorm{1,2}d: normalize with biased batch variance; running stats
updated with momentum=0.1 using the UNBIASED batch variance; eps=1e-5.
Used by the fashionmnist/multimnist/celeba/vision nets
(e.g. /root/reference/celeba/model.py:80-87).

State is a dict {"mean": (C,), "var": (C,)}. In train mode the apply returns
the EMA-updated state; in eval mode it normalizes with the running stats.

When a decoder is vmapped over the ELBO-term axis, batch statistics are
computed per-term (matching the reference's one-forward-per-term behavior);
the caller averages the per-term new states before committing the EMA update.
"""

import jax.numpy as jnp

# torch default momentum; the engine's exact sequential-EMA composition
# (core/engine.py:commit_ema_states) assumes every BN in the framework
# uses this value
BN_MOMENTUM = 0.1


def batchnorm_init(c: int, dtype=jnp.float32):
    params = {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    state = {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}
    return params, state


def batchnorm_apply(params, state, x, *, train: bool,
                    momentum: float = BN_MOMENTUM, eps: float = 1e-5):
    """x: (..., C); normalizes over all leading axes."""
    if train:
        axes = tuple(range(x.ndim - 1))
        n = 1
        for a in axes:
            n *= x.shape[a]
        mean = jnp.mean(x, axis=axes)
        var = jnp.mean(jnp.square(x - mean), axis=axes)  # biased, for norm
        # unbiased variance feeds the running estimate (torch behavior)
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    y = (x - mean) * inv * params["scale"] + params["bias"]
    return y, new_state
