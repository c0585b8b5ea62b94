"""Parameter initializers matching PyTorch layer defaults.

The reference relies on PyTorch-default initialization everywhere (it never
calls an explicit init — e.g. /root/reference/mnist/model.py:73-79). To keep
training dynamics comparable we reproduce those distributions:

  * nn.Linear / nn.Conv2d / nn.ConvTranspose2d: kaiming_uniform(a=sqrt(5))
    => U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for the weight, same bound for bias.
  * nn.Embedding: N(0, 1).
  * nn.GRU: U(-1/sqrt(hidden), 1/sqrt(hidden)) for every tensor.
"""

import math

import jax
import jax.numpy as jnp


def kaiming_uniform_bound(fan_in: int) -> float:
    # torch kaiming_uniform_(a=sqrt(5)): gain=sqrt(2/(1+5)); bound=gain*sqrt(3/fan_in)
    return 1.0 / math.sqrt(fan_in)


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_init(key, d_in: int, d_out: int, *, bias: bool = True,
                dtype=jnp.float32):
    """Weight stored as (d_in, d_out) so forward is x @ w (row-major MXU)."""
    kw, kb = jax.random.split(key)
    bound = kaiming_uniform_bound(d_in)
    p = {"w": _uniform(kw, (d_in, d_out), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (d_out,), bound, dtype)
    return p


def conv_init(key, c_in: int, c_out: int, kernel: int, *, bias: bool = False,
              dtype=jnp.float32):
    """Kernel stored HWIO (TPU-friendly NHWC convs)."""
    kw, kb = jax.random.split(key)
    fan_in = c_in * kernel * kernel
    bound = kaiming_uniform_bound(fan_in)
    p = {"w": _uniform(kw, (kernel, kernel, c_in, c_out), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (c_out,), bound, dtype)
    return p


def conv_transpose_init(key, c_in: int, c_out: int, kernel: int, *,
                        bias: bool = False, dtype=jnp.float32):
    """Kernel stored (kh, kw, c_out, c_in) — the FORWARD-conv HWIO layout
    that lax.conv_transpose(transpose_kernel=True) consumes (a transposed
    conv is the gradient of a forward conv mapping c_out -> c_in).

    torch ConvTranspose2d computes fan_in from weight.shape[1] (= out
    channels) * receptive field; we reproduce that bound.
    """
    kw, kb = jax.random.split(key)
    fan_in = c_out * kernel * kernel
    bound = kaiming_uniform_bound(fan_in)
    p = {"w": _uniform(kw, (kernel, kernel, c_out, c_in), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (c_out,), bound, dtype)
    return p


def embedding_init(key, n_embeddings: int, dim: int, *, dtype=jnp.float32):
    return {"table": jax.random.normal(key, (n_embeddings, dim), dtype)}


def gru_init(key, d_in: int, d_hidden: int, *, dtype=jnp.float32):
    """One GRU layer's parameters, torch layout.

    w_ih: (d_in, 3*H) for [r|z|n] gates; w_hh: (H, 3*H); separate input and
    hidden biases (torch keeps both; the reset gate multiplies b_hh_n inside
    the candidate, so the two biases are NOT mergeable).
    """
    ks = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(d_hidden)
    return {
        "w_ih": _uniform(ks[0], (d_in, 3 * d_hidden), bound, dtype),
        "w_hh": _uniform(ks[1], (d_hidden, 3 * d_hidden), bound, dtype),
        "b_ih": _uniform(ks[2], (3 * d_hidden,), bound, dtype),
        "b_hh": _uniform(ks[3], (3 * d_hidden,), bound, dtype),
    }
